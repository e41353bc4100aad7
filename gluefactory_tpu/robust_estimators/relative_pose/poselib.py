"""In-repo native LO-RANSAC relative-pose estimator — fills the reference's
PoseLib slot (`robust_estimators/relative_pose/poselib.py:9-44`) with our own
C++ implementation (`native/fastransac.cpp`): 5-point minimal hypotheses
(hidden-variable solver — same sample size as the real PoseLib/cv2 backends),
MSAC scoring with adaptive 99.9%-confidence termination, weighted 8-point LO
refit, cheirality-resolved decomposition."""

from __future__ import annotations

import numpy as np

from ...geometry.wrappers import Pose
from ..base_estimator import BaseEstimator
from ..native import ransac_essential_native


class PoseLibRelativePoseEstimator(BaseEstimator):
    default_conf = {"ransac_th": 2.0, "options": {"max_iterations": 2000}, "seed": 0}

    def _forward(self, data: dict) -> dict:
        kpts0 = np.asarray(data["m_kpts0"], np.float64)
        kpts1 = np.asarray(data["m_kpts1"], np.float64)
        camera0 = data["camera0"]
        camera1 = data["camera1"]
        if len(kpts0) < 5:
            return {
                "success": False,
                "M_0to1": Pose.identity(),
                "inliers": np.zeros(len(kpts0), bool),
            }
        f_mean = 0.5 * (
            float(np.asarray(camera0.f).mean()) + float(np.asarray(camera1.f).mean())
        )
        p0 = np.asarray(camera0.normalize(kpts0[None].astype(np.float32)))[0]
        p1 = np.asarray(camera1.normalize(kpts1[None].astype(np.float32)))[0]
        R, t, inliers, num = ransac_essential_native(
            p0, p1, self.conf.ransac_th / f_mean,
            max_iters=self.conf.options.max_iterations, seed=self.conf.seed,
        )
        return {
            "success": num >= 5,
            "M_0to1": Pose.from_Rt(R.astype(np.float32), t.astype(np.float32)),
            "inliers": inliers,
        }
