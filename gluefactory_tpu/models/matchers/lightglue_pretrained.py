"""Thin wrapper around converted official LightGlue weights (role of
reference `models/matchers/lightglue_pretrained.py:7-36`, which wraps the pip
`lightglue` package).

Here "pretrained" means: the native flax LightGlue with weights converted
from the official release via `compat/torch_conversion.py` (zero-egress: the
torch file must already be on disk; convert once, point `weights_file` at the
msgpack)."""

from __future__ import annotations

from .lightglue import LightGlue

FEATURE_CONFS = {
    "superpoint": {"input_dim": 256, "add_scale_ori": False},
    "disk": {"input_dim": 128, "add_scale_ori": False},
    "aliked": {"input_dim": 128, "add_scale_ori": False},
    "sift": {"input_dim": 128, "add_scale_ori": True},
}


class LightGluePretrained(LightGlue):
    default_conf = {
        "features": "superpoint",
        "weights_file": None,  # converted msgpack (compat/torch_conversion.py)
        "depth_confidence": 0.95,
        "width_confidence": 0.99,
        "filter_threshold": 0.1,
        "trainable": False,
    }

    @classmethod
    def resolve_conf(cls, conf=None):
        conf = dict(conf or {})
        feats = conf.get("features", cls.default_conf["features"])
        merged = {**FEATURE_CONFS[feats], **conf}
        return super().resolve_conf(merged)
