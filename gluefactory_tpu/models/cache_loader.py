"""Cached-feature loader (role of reference `models/cache_loader.py:59-144`).

Host-side (runs in data workers): reads per-item features from an h5 cache
(path is a format string, e.g. `exports/megadepth-.../{scene}.h5`), rescales
keypoints/lines by the view scales, and pads to a fixed length with a
validity mask (`pad_local_features`, reference `cache_loader.py:13-41`) so
batches keep static shapes. The TwoViewPipeline consumes the result through
`data[viewX]["cache"]` + `allow_no_extract` (train-without-extractor path,
SURVEY §3.5).
"""

from __future__ import annotations

import string
from pathlib import Path

import h5py
import numpy as np

from ..core.config import Config, merge
from ..settings import DATA_PATH


def pad_to_length(x: np.ndarray, length: int, pad_dim: int = 0, mode: str = "zeros"):
    """Pad along pad_dim to `length`; returns (padded, valid_mask)."""
    n = x.shape[pad_dim]
    if n > length:
        sl = [slice(None)] * x.ndim
        sl[pad_dim] = slice(0, length)
        mask = np.ones(length, bool)
        return x[tuple(sl)], mask
    pad_width = [(0, 0)] * x.ndim
    pad_width[pad_dim] = (0, length - n)
    if mode == "zeros":
        padded = np.pad(x, pad_width)
    elif mode == "random_c":  # random in-range values (used for keypoints)
        padded = np.pad(x, pad_width, mode="edge")
    else:
        raise ValueError(mode)
    mask = np.zeros(length, bool)
    mask[:n] = True
    return padded, mask


def pad_local_features(pred: dict, seq_l: int) -> dict:
    """Pad keypoints/scores/descriptors (+lines) to fixed length with masks
    (reference `cache_loader.py:13-41`)."""
    out = dict(pred)
    if "keypoints" in pred:
        out["keypoints"], mask = pad_to_length(pred["keypoints"], seq_l)
        out["keypoint_mask"] = mask
        if "keypoint_scores" in pred:
            out["keypoint_scores"], _ = pad_to_length(pred["keypoint_scores"], seq_l)
        if "descriptors" in pred:
            out["descriptors"], _ = pad_to_length(pred["descriptors"], seq_l)
        if "scales" in pred:
            out["scales"], _ = pad_to_length(pred["scales"], seq_l)
        if "oris" in pred:
            out["oris"], _ = pad_to_length(pred["oris"], seq_l)
    if "lines" in pred:
        out["lines"], lmask = pad_to_length(pred["lines"], seq_l)
        out["line_mask"] = lmask
        if "line_scores" in pred:
            out["line_scores"], _ = pad_to_length(pred["line_scores"], seq_l)
    return out


class CacheLoader:
    default_conf = {
        "path": "???",  # format string like exports/{method}/{scene}.h5
        "data_keys": ["keypoints", "keypoint_scores", "descriptors"],
        "scale": ["keypoints", "lines", "orig_lines"],
        "padding_length": None,
        "numeric_type": "float32",  # reference cache_loader.py:27 user-facing key name
        "collate": False,
    }

    def __init__(self, conf=None):
        self.conf = merge(Config(self.default_conf), conf or {})
        self._files: dict = {}

    def _file(self, path: str) -> h5py.File:
        if path not in self._files:
            p = Path(path)
            if not p.is_absolute():
                p = DATA_PATH / path
            self._files[path] = h5py.File(str(p), "r")
        return self._files[path]

    def __call__(self, data: dict) -> dict:
        """data holds format-string fields (scene, name, ...) and optional
        `scales` for rescaling into processed coordinates."""
        fields = {
            k: (v[0] if isinstance(v, (list, tuple)) else v)
            for k, v in data.items()
            if isinstance(v, (str, list, tuple)) or np.isscalar(v)
        }
        path_keys = [
            t[1] for t in string.Formatter().parse(self.conf.path) if t[1] is not None
        ]
        path = self.conf.path.format(**{k: fields[k] for k in path_keys})
        hfile = self._file(path)
        name = fields.get("name", None)
        grp = hfile[str(name)] if name is not None else hfile
        pred = {}
        for k in self.conf.data_keys:
            if k in grp:
                arr = np.asarray(grp[k])
                if np.issubdtype(arr.dtype, np.floating):
                    arr = arr.astype(self.conf.numeric_type)
                pred[k] = arr
        # rescale into processed coordinates
        scales = data.get("scales")
        if scales is not None:
            s = np.asarray(scales, np.float32).reshape(-1)[-2:]
            for pattern in self.conf.scale:
                for k in list(pred.keys()):
                    if k.startswith(pattern):
                        pred[k] = pred[k] * s.reshape(*([1] * (pred[k].ndim - 1)), 2)
        if self.conf.padding_length:
            pred = pad_local_features(pred, int(self.conf.padding_length))
        return pred

    def close(self):
        for f in self._files.values():
            f.close()
        self._files = {}
