"""Hybrid point+line homography estimator (role of reference
`robust_estimators/homography/homography_est.py:14-74`, which wraps the
`homography_est` C++ library's `ransac_point_line_homography`).

Backed by the batched XLA hybrid RANSAC in `ops/ransac.py`: 4-point
hypotheses scored jointly by point transfer error and line
endpoint-to-line distance, LO refit.
"""

from __future__ import annotations

import jax
import numpy as np

from ...ops.ransac import ransac_homography_hybrid
from ..base_estimator import BaseEstimator
from .xla_ransac import bucket_pad


def bucket_pad_lines(lines0, lines1, min_size=16):
    n = len(lines0)
    size = max(min_size, 1 << int(np.ceil(np.log2(max(n, 1)))))
    valid = np.zeros(size, bool)
    valid[:n] = True
    l0 = np.zeros((size, 2, 2), np.float32)
    l1 = np.zeros((size, 2, 2), np.float32)
    l0[:n] = lines0
    l1[:n] = lines1
    return l0, l1, valid, n


class PointLineHomographyEstimator(BaseEstimator):
    default_conf = {"ransac_th": 2.0, "n_iters": 1024, "seed": 0}

    def _forward(self, data: dict) -> dict:
        pts0 = np.asarray(data.get("m_kpts0", np.zeros((0, 2))), np.float32)
        pts1 = np.asarray(data.get("m_kpts1", np.zeros((0, 2))), np.float32)
        lines0 = np.asarray(data.get("m_lines0", np.zeros((0, 2, 2))), np.float32)
        lines1 = np.asarray(data.get("m_lines1", np.zeros((0, 2, 2))), np.float32)
        if len(pts0) < 4:
            return {
                "success": False,
                "M_0to1": np.eye(3, dtype=np.float32),
                "inliers": np.zeros(len(pts0), bool),
            }
        p0, p1, pvalid, n = bucket_pad(pts0, pts1)
        l0, l1, lvalid, nl = bucket_pad_lines(lines0, lines1)
        out = ransac_homography_hybrid(
            p0, p1, pvalid, l0, l1, lvalid, float(self.conf.ransac_th),
            jax.random.key(self.conf.seed), n_iters=int(self.conf.n_iters),
        )
        return {
            "success": bool(out["success"]),
            "M_0to1": np.asarray(out["M_0to1"], np.float32),
            "inliers": np.asarray(out["inliers"])[:n],
            "line_inliers": np.asarray(out["line_inliers"])[:nl],
        }
