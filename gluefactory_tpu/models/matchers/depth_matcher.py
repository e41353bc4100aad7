"""GT matcher from relative pose + depth maps (pipeline `ground_truth`).

Role of reference `models/matchers/depth_matcher.py:17-89`: wraps
`gt_matches_from_pose_depth`. The reference forces fp32 under AMP
(`depth_matcher.py:10-14`); here GT generation always computes in fp32
(geometry inputs are stored fp32; matcher bf16 never touches this path).
"""

from __future__ import annotations

from ...geometry.gt_generation import gt_matches_from_pose_depth
from ..base_model import BaseModel


class DepthMatcher(BaseModel):
    default_conf = {
        "use_points": True,
        "use_lines": False,
        "th_positive": 3.0,
        "th_negative": 5.0,
        "th_epi": None,  # epipolar threshold (px) for extra negatives
        "ccth": None,  # cycle-consistency relative depth threshold
        "n_line_sampled_pts": 50,
        "line_perp_dist_th": 5.0,
        "overlap_th": 0.2,
        "min_visibility_th": 0.5,
    }
    required_data_keys = ["view0", "view1", "T_0to1"]

    def _forward(self, data: dict, train: bool = False) -> dict:
        result = {}
        if self.conf.use_points:
            out = gt_matches_from_pose_depth(
                data["keypoints0"],
                data["keypoints1"],
                data["view0"]["camera"],
                data["view1"]["camera"],
                data["T_0to1"],
                data["view0"]["depth"],
                data["view1"]["depth"],
                pos_th=self.conf.th_positive,
                neg_th=self.conf.th_negative,
                epi_th=self.conf.th_epi,
                ccth=self.conf.ccth,
                mask0=data.get("keypoint_mask0"),
                mask1=data.get("keypoint_mask1"),
            )
            result["gt_matches0"] = out["matches0"]
            result["gt_matches1"] = out["matches1"]
            result["gt_assignment"] = out["assignment"]
            result["gt_visible0"] = out["visible0"]
            result["gt_visible1"] = out["visible1"]
        if self.conf.use_lines:
            from ...geometry.gt_lines import gt_line_matches_from_pose_depth

            lout = gt_line_matches_from_pose_depth(
                data["lines0"],
                data["lines1"],
                data["line_mask0"],
                data["line_mask1"],
                data["view0"]["camera"],
                data["view1"]["camera"],
                data["T_0to1"],
                data["view0"]["depth"],
                data["view1"]["depth"],
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
