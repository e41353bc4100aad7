"""Open-source SuperPoint (rpautrat re-training, MIT) — the BatchNorm variant
of the VGG SuperPoint (role of reference `models/extractors/superpoint_open.py:78-216`).

Same decode path as the vanilla model; implemented by the shared flax
SuperPoint with `variant: "open"` (BatchNorm after every conv).
"""

from __future__ import annotations

from .superpoint import SuperPoint


class SuperPointOpen(SuperPoint):
    default_conf = {
        "variant": "open",
        "descriptor_dim": 256,
        "nms_radius": 4,  # reference superpoint_open.py:81
        "detection_threshold": 0.005,
    }
