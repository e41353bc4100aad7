"""GT matcher from a known homography (pipeline `ground_truth` component).

Role of reference `models/matchers/homography_matcher.py:8-66`: wraps
`gt_matches_from_homography`, outputs `gt_matches0/1`, `gt_assignment`.
Non-parametric (no params) — pure supervision generator that runs on device
inside the training step.
"""

from __future__ import annotations

from ...geometry.gt_generation import gt_matches_from_homography
from ..base_model import BaseModel


class HomographyMatcher(BaseModel):
    default_conf = {
        "use_points": True,
        "use_lines": False,
        "th_positive": 3.0,
        "th_negative": 6.0,
        # line GT (GlueStick) options
        "n_line_sampled_pts": 50,
        "line_perp_dist_th": 5.0,
        "overlap_th": 0.2,
        "min_visibility_th": 0.5,
    }
    required_data_keys = ["H_0to1"]

    def _forward(self, data: dict, train: bool = False) -> dict:
        result = {}
        if self.conf.use_points:
            out = gt_matches_from_homography(
                data["keypoints0"],
                data["keypoints1"],
                data["H_0to1"],
                pos_th=self.conf.th_positive,
                neg_th=self.conf.th_negative,
                mask0=data.get("keypoint_mask0"),
                mask1=data.get("keypoint_mask1"),
            )
            result["gt_matches0"] = out["matches0"]
            result["gt_matches1"] = out["matches1"]
            result["gt_assignment"] = out["assignment"]
        if self.conf.use_lines:
            from ...geometry.gt_lines import gt_line_matches_from_homography

            # images are NHWC; the reference passes NCHW image shapes
            # (homography_matcher.py:52-53) — both reduce to (h, w)
            shape0 = tuple(data["view0"]["image"].shape[1:3])
            shape1 = tuple(data["view1"]["image"].shape[1:3])
            lout = gt_line_matches_from_homography(
                data["lines0"],
                data["lines1"],
                data["line_mask0"],
                data["line_mask1"],
                shape0,
                shape1,
                data["H_0to1"],
                n_samples=self.conf.n_line_sampled_pts,
                perp_dist_th=self.conf.line_perp_dist_th,
                overlap_th=self.conf.overlap_th,
                min_visibility_th=self.conf.min_visibility_th,
            )
            result["gt_line_matches0"] = lout["matches0"]
            result["gt_line_matches1"] = lout["matches1"]
            result["gt_line_assignment"] = lout["assignment"]
        return result

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
