"""Batched XLA essential-matrix RANSAC estimator (TPU-native default).

Replaces the reference's PoseLib/pycolmap relative-pose wrappers
(`robust_estimators/relative_pose/{poselib,pycolmap}.py`) with the
5-point hypothesize-score pipeline (+ 8-point LO refit) and
cheirality-resolved decomposition in `ops/ransac.py`.
"""

from __future__ import annotations

import jax
import numpy as np

from ...geometry.wrappers import Pose
from ...ops.ransac import ransac_essential
from ..base_estimator import BaseEstimator
from ..homography.xla_ransac import bucket_pad


class XLARelativePoseEstimator(BaseEstimator):
    default_conf = {
        "ransac_th": 1.0,  # pixels
        # 5-point minimal solver (reference parity: cv2/poselib/pycolmap all
        # hypothesize from 5 pts) yields up to 10 candidate E per sample, so
        # fewer samples cover more hypotheses; "8pt" restores the old path.
        "solver": "5pt",
        "n_iters": 512,
        "seed": 0,
    }

    def _forward(self, data: dict) -> dict:
        kpts0 = np.asarray(data["m_kpts0"], np.float32)
        kpts1 = np.asarray(data["m_kpts1"], np.float32)
        camera0 = data["camera0"]
        camera1 = data["camera1"]
        min_pts = 5 if self.conf.solver == "5pt" else 8
        if len(kpts0) < min_pts:
            return {
                "success": False,
                "M_0to1": Pose.identity(),
                "inliers": np.zeros(len(kpts0), bool),
            }
        f_mean = 0.5 * (
            float(np.asarray(camera0.f).mean()) + float(np.asarray(camera1.f).mean())
        )
        norm_th = float(self.conf.ransac_th) / f_mean
        pts0 = np.asarray(camera0.normalize(kpts0[None]))[0]
        pts1 = np.asarray(camera1.normalize(kpts1[None]))[0]
        p0, p1, valid, n = bucket_pad(pts0, pts1)
        out = ransac_essential(
            p0, p1, valid, norm_th, jax.random.key(self.conf.seed),
            n_iters=int(self.conf.n_iters),
            solver=str(self.conf.solver),
        )
        R = np.asarray(out["R"], np.float32)
        t = np.asarray(out["t"], np.float32)
        return {
            "success": bool(out["success"]),
            "M_0to1": Pose.from_Rt(R, t),
            "inliers": np.asarray(out["inliers"])[:n],
        }
