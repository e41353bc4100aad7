"""Batched XLA homography RANSAC estimator (TPU-native default).

Replaces the reference's PoseLib LO-RANSAC wrapper
(`robust_estimators/homography/poselib.py:8-40`) with the jit-compiled
hypothesize-score-refine pipeline in `ops/ransac.py`. Inputs are padded to
power-of-two buckets to bound recompilation across variable match counts.
"""

from __future__ import annotations

import jax
import numpy as np

from ...ops.ransac import ransac_homography
from ..base_estimator import BaseEstimator


def bucket_pad(pts0, pts1, min_size=64):
    n = len(pts0)
    size = max(min_size, 1 << int(np.ceil(np.log2(max(n, 1)))))
    valid = np.zeros(size, bool)
    valid[:n] = True
    p0 = np.zeros((size, 2), np.float32)
    p1 = np.zeros((size, 2), np.float32)
    p0[:n] = pts0
    p1[:n] = pts1
    return p0, p1, valid, n


class XLAHomographyEstimator(BaseEstimator):
    default_conf = {
        "ransac_th": 3.0,
        "n_iters": 1024,
        "seed": 0,
    }

    def _forward(self, data: dict) -> dict:
        pts0 = np.asarray(data["m_kpts0"], np.float32)
        pts1 = np.asarray(data["m_kpts1"], np.float32)
        if len(pts0) < 4:
            return {
                "success": False,
                "M_0to1": np.eye(3, dtype=np.float32),
                "inliers": np.zeros(len(pts0), bool),
            }
        p0, p1, valid, n = bucket_pad(pts0, pts1)
        out = ransac_homography(
            p0, p1, valid, float(self.conf.ransac_th),
            jax.random.key(self.conf.seed), n_iters=int(self.conf.n_iters),
        )
        return {
            "success": bool(out["success"]),
            "M_0to1": np.asarray(out["M_0to1"], np.float32),
            "inliers": np.asarray(out["inliers"])[:n],
        }
