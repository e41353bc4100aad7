"""KeyNet+AffNet+HardNet LAF detector/descriptor wrapper (role of reference
`models/extractors/keynet_affnet_hardnet.py:8-74`, a kornia wrapper).
Activates when kornia is importable (not in this environment)."""

from __future__ import annotations

from ..base_model import BaseModel


class KeyNetAffNetHardNet(BaseModel):
    default_conf = {"max_num_keypoints": 2048, "upright": False, "trainable": False}
    required_data_keys = ["image"]

    def setup(self):
        try:
            import kornia  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "KeyNet+AffNet+HardNet requires the `kornia` package (torch), "
                "which is not available in this environment."
            ) from e

    def _forward(self, data, train: bool = False):
        raise NotImplementedError("host inference hook — requires kornia")

    def loss(self, pred, data):
        raise NotImplementedError
