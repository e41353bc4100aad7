"""pycolmap two-view geometry estimator wrapper (role of reference
`robust_estimators/relative_pose/pycolmap.py:9-52`). Activates when the
pycolmap package is importable; otherwise the in-repo `poselib` (native C++
LO-RANSAC) and `xla_ransac` backends cover the capability."""

from __future__ import annotations

import numpy as np

from ...geometry.wrappers import Pose
from ..base_estimator import BaseEstimator


class PycolmapTwoViewEstimator(BaseEstimator):
    default_conf = {
        "ransac_th": 4.0,
        "options": {"confidence": 0.9999, "min_num_trials": 1000, "max_num_trials": 100000},
    }

    def _init(self, conf):
        try:
            import pycolmap  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "pycolmap is not available in this environment; use the "
                "`poselib` (in-repo native) or `xla_ransac` estimators."
            ) from e

    def _forward(self, data: dict) -> dict:
        import pycolmap

        pts0 = np.asarray(data["m_kpts0"], np.float64)
        pts1 = np.asarray(data["m_kpts1"], np.float64)
        camera0 = data["camera0"]
        camera1 = data["camera1"]
        info = pycolmap.two_view_geometry_estimation(
            pts0,
            pts1,
            pycolmap.Camera(**camera0.to_cameradict()),
            pycolmap.Camera(**camera1.to_cameradict()),
            estimation_options={
                "ransac": {
                    "max_error": self.conf.ransac_th,
                    "confidence": self.conf.options.confidence,
                    "min_num_trials": self.conf.options.min_num_trials,
                    "max_num_trials": self.conf.options.max_num_trials,
                }
            },
        )
        success = info.success if hasattr(info, "success") else info["success"]
        if not success:
            return {
                "success": False,
                "M_0to1": Pose.identity(),
                "inliers": np.zeros(len(pts0), bool),
            }
        cam2_from_cam1 = info.cam2_from_cam1
        return {
            "success": True,
            "M_0to1": Pose.from_Rt(
                np.asarray(cam2_from_cam1.rotation.matrix(), np.float32),
                np.asarray(cam2_from_cam1.translation, np.float32),
            ),
            "inliers": np.asarray(info.inliers, bool),
        }
