"""OpenCV essential-matrix + recoverPose wrapper (role of reference
`robust_estimators/relative_pose/opencv.py:10-64`). Host-side parity path."""

from __future__ import annotations

import cv2
import numpy as np

from ...geometry.wrappers import Pose
from ..base_estimator import BaseEstimator


class OpenCVRelativePoseEstimator(BaseEstimator):
    default_conf = {
        "ransac_th": 0.5,  # pixels
        "options": {"confidence": 0.99999, "method": "ransac"},
    }

    def _forward(self, data: dict) -> dict:
        kpts0 = np.asarray(data["m_kpts0"], np.float64)
        kpts1 = np.asarray(data["m_kpts1"], np.float64)
        camera0 = data["camera0"]
        camera1 = data["camera1"]
        method = {"ransac": cv2.RANSAC, "usac_magsac": cv2.USAC_MAGSAC}[
            self.conf.options.method
        ]
        result = {"success": False, "M_0to1": Pose.identity(), "inliers": np.zeros(len(kpts0), bool)}
        if len(kpts0) < 5:
            return result
        f_mean = 0.5 * (
            float(np.asarray(camera0.f).mean()) + float(np.asarray(camera1.f).mean())
        )
        norm_thresh = self.conf.ransac_th / f_mean
        pts0 = np.asarray(camera0.normalize(kpts0[None]))[0]
        pts1 = np.asarray(camera1.normalize(kpts1[None]))[0]
        E, mask = cv2.findEssentialMat(
            pts0,
            pts1,
            np.eye(3),
            threshold=norm_thresh,
            prob=self.conf.options.confidence,
            method=method,
        )
        if E is None:
            return result
        best_num_inliers = 0
        for E_ in np.split(E, len(E) / 3):
            n, R, t, mask_ = cv2.recoverPose(E_, pts0, pts1, np.eye(3), 1e9, mask=mask.copy())
            if n > best_num_inliers:
                best_num_inliers = n
                result = {
                    "success": True,
                    "M_0to1": Pose.from_Rt(R.astype(np.float32), t.squeeze(-1).astype(np.float32)),
                    "inliers": mask_.ravel().astype(bool),
                }
        return result
