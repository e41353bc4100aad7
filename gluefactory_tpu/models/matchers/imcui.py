"""IMCUI matcher-zoo wrapper (role of reference
`gluefactory_nonfree/imcui.py:25-126`): evaluate arbitrary community
matchers from the image-matching-webui zoo through its `ImageMatchingAPI`.

The zoo plumbing (config resolution, zoo lookup, conf merge, prediction
conversion to the aligned-match-list contract) is implemented here; only
the actual network inference requires the `imcui` package, which cannot be
installed in this zero-egress environment — `_forward` raises a clear error
until it is. `convert_imcui_pred` is pure numpy and unit-tested.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ... import logger
from ...settings import DATA_PATH
from ..base_model import BaseModel


def resolve_imcui_config_path(config_path=None) -> Path:
    """Reference `imcui.py:39-56` semantics, zero-egress: explicit path >
    the installed package's config > a pre-placed DATA_PATH copy (the
    reference downloads from GitHub here; place `imcui_config.yaml` under
    DATA_PATH manually instead)."""
    if config_path is not None:
        return Path(config_path)
    try:
        from imcui.ui import app_class

        local = Path(app_class.__file__).parent / "config.yaml"
        if local.exists():
            return local
    except ImportError:
        pass
    target = DATA_PATH / "imcui_config.yaml"
    if target.exists():
        return target
    raise FileNotFoundError(
        "no IMCUI zoo config: install the imcui package or place "
        f"imcui_config.yaml at {target} (zero-egress: no auto-download)"
    )


def resolve_zoo_conf(zoo_name, custom, config_path=None) -> dict:
    """Look up `zoo_name` in the IMCUI matcher zoo and merge `custom` over
    it (reference `imcui.py:59-78`)."""
    model_conf: dict = {}
    if zoo_name is not None and zoo_name != "none":
        from imcui.ui.utils import get_matcher_zoo, load_config

        imc_config = load_config(resolve_imcui_config_path(config_path))
        matcher_zoo = get_matcher_zoo(imc_config["matcher_zoo"])
        if zoo_name not in matcher_zoo:
            raise ValueError(
                f"Matcher {zoo_name!r} not in the IMCUI zoo; available: "
                f"{list(matcher_zoo.keys())}"
            )
        model_conf = dict(matcher_zoo[zoo_name])

    def deep_merge(dst, src):
        for k, v in dict(src).items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_merge(dst[k], v)
            else:
                dst[k] = v
        return dst

    return deep_merge(model_conf, dict(custom or {}))


def convert_imcui_pred(imcui_pred: dict, max_num_matches=None) -> dict:
    """IMCUI output -> the aligned-match-list contract (reference
    `imcui.py:100-122`): keypoints are the matched pairs themselves, with
    identity `matches0/1` and `mconf` as every score; optionally keep only
    the top `max_num_matches` by confidence."""
    k0 = np.asarray(imcui_pred["mkeypoints0_orig"])
    k1 = np.asarray(imcui_pred["mkeypoints1_orig"])
    conf = np.asarray(imcui_pred["mconf"])
    n = k0.shape[0]
    if max_num_matches is not None and n > max_num_matches:
        idxs = np.argpartition(conf, -max_num_matches)[-max_num_matches:]
        k0, k1, conf = k0[idxs], k1[idxs], conf[idxs]
        n = k0.shape[0]
    arange = np.arange(n)
    return {
        "keypoints0": k0[None].astype(np.float32),
        "keypoints1": k1[None].astype(np.float32),
        "keypoint_scores0": conf[None].astype(np.float32),
        "keypoint_scores1": conf[None].astype(np.float32),
        "matches0": arange[None].astype(np.int32),
        "matches1": arange[None].astype(np.int32),
        "matching_scores0": conf[None].astype(np.float32),
        "matching_scores1": conf[None].astype(np.float32),
    }


class IMCUIMatcher(BaseModel):
    default_conf = {
        "zoo_name": "none",
        "custom": {},  # overwrites the zoo config
        "config_path": None,
        "device": "cpu",
        "detection_threshold": 0.015,
        "max_num_keypoints": 100000,
        "match_threshold": 0.0,
        "max_num_matches": None,
        "trainable": False,
    }
    required_data_keys = ["view0", "view1"]

    def setup(self):
        pass

    def _build_api(self):
        try:
            from imcui.api import ImageMatchingAPI
        except ImportError as e:
            raise ImportError(
                "IMCUI eval requires the `imcui` package "
                "(image-matching-webui), which is not installed in this "
                "environment; the zoo/conversion plumbing is ready — install "
                "the package to enable inference."
            ) from e
        c = self.conf
        model_conf = resolve_zoo_conf(
            c.zoo_name, dict(c.custom or {}), c.config_path
        )
        logger.info("IMCUI matcher configuration: %s", model_conf)
        return ImageMatchingAPI(
            conf={**model_conf, "ransac": {"enable": False}},
            device=c.device,
            detect_threshold=c.detection_threshold,
            max_keypoints=c.max_num_keypoints,
            match_threshold=c.match_threshold,
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        import jax.numpy as jnp

        api = self._build_api()
        img0 = np.asarray(data["view0"]["image"])  # (1, H, W, C), [0, 1]
        img1 = np.asarray(data["view1"]["image"])
        assert img0.shape[0] == 1 and img0.ndim == 4, "IMCUI runs batch 1"
        imcui_pred = api(img0[0] * 255.0, img1[0] * 255.0)
        np_pred = convert_imcui_pred(imcui_pred, self.conf.max_num_matches)
        return {k: jnp.asarray(v) for k, v in np_pred.items()}

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError("IMCUIMatcher is eval-only")
