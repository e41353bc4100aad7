"""NON-CIRCULAR eval-metric parity: the EXECUTING reference
`gluefactory/eval/utils.py` (torch, CPU) vs `gluefactory_tpu/eval/utils.py`
on identical inputs.

These functions compute every headline-table number (epipolar/reprojection
precision, pose AUC/mAA, PR/AP); proving them equal to the executing
reference means converted-weights evals produce the reference's numbers.

Covered: eval_matches_epipolar (:41-70), eval_matches_depth (:73-134),
eval_matches_homography (:137-156), eval_relative_pose_robust via the
OpenCV estimator (:159-194), eval_poses/AUC (:264-289), PR helpers
(:292-337).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.torchref

from torchref import load_reference  # noqa: E402

load_reference()

import gluefactory.eval.utils as ref_eval  # noqa: E402
from test_torchref_geometry import (  # noqa: E402
    _depth_setup,
    make_cameras,
    rand_H,
    rand_pose,
)

import gluefactory_tpu.eval.utils as my_eval  # noqa: E402


def _matches(rng, N0, N1, n_valid):
    """Random partial matching: n_valid entries of matches0 point at distinct
    kp1 indices, the rest are -1."""
    m0 = np.full(N0, -1, np.int64)
    sel0 = rng.choice(N0, n_valid, replace=False)
    sel1 = rng.choice(N1, n_valid, replace=False)
    m0[sel0] = sel1
    scores = rng.uniform(0.05, 1.0, N0).astype(np.float32)
    scores[m0 < 0] = 0.0
    return m0, scores


def test_eval_matches_homography_parity():
    rng = np.random.default_rng(0)
    N0, N1 = 40, 44
    H = rand_H(rng, 1)[0]
    kp0 = rng.uniform(0, 100, (N0, 2)).astype(np.float32)
    kp1 = rng.uniform(0, 100, (N1, 2)).astype(np.float32)
    m0, scores = _matches(rng, N0, N1, 20)

    ref = ref_eval.eval_matches_homography(
        {"H_0to1": torch.from_numpy(H)},
        {
            "keypoints0": torch.from_numpy(kp0),
            "keypoints1": torch.from_numpy(kp1),
            "matches0": torch.from_numpy(m0),
            "matching_scores0": torch.from_numpy(scores),
        },
    )
    mine = my_eval.eval_matches_homography(
        {"H_0to1": H},
        {
            "keypoints0": kp0,
            "keypoints1": kp1,
            "matches0": m0,
            "matching_scores0": scores,
        },
    )
    for k in ("prec@1px", "prec@3px"):
        np.testing.assert_allclose(mine[k], float(ref[k]), atol=1e-6, err_msg=k)
    assert mine["num_matches"] == int(ref["num_matches"])
    assert float(mine["num_keypoints"]) == float(ref["num_keypoints"])

    # empty-match case: the reference maps NaN means to 0.0
    m_empty = np.full(N0, -1, np.int64)
    ref0 = ref_eval.eval_matches_homography(
        {"H_0to1": torch.from_numpy(H)},
        {
            "keypoints0": torch.from_numpy(kp0),
            "keypoints1": torch.from_numpy(kp1),
            "matches0": torch.from_numpy(m_empty),
            "matching_scores0": torch.from_numpy(scores),
        },
    )
    mine0 = my_eval.eval_matches_homography(
        {"H_0to1": H},
        {
            "keypoints0": kp0,
            "keypoints1": kp1,
            "matches0": m_empty,
            "matching_scores0": scores,
        },
    )
    assert float(ref0["prec@1px"]) == mine0["prec@1px"] == 0.0


def test_eval_matches_epipolar_parity():
    rng = np.random.default_rng(1)
    N0, N1 = 36, 36
    ref_T, my_T = rand_pose(rng, 1, t_scale=0.5)
    ref_cam, my_cam = make_cameras(rng, 1)
    kp0 = rng.uniform(2, [126, 94], (N0, 2)).astype(np.float32)
    kp1 = rng.uniform(2, [126, 94], (N1, 2)).astype(np.float32)
    m0, scores = _matches(rng, N0, N1, 24)

    ref = ref_eval.eval_matches_epipolar(
        {
            "view0": {"camera": ref_cam[0]},
            "view1": {"camera": ref_cam[0]},
            "T_0to1": ref_T[0],
        },
        {
            "keypoints0": torch.from_numpy(kp0),
            "keypoints1": torch.from_numpy(kp1),
            "matches0": torch.from_numpy(m0),
            "matching_scores0": torch.from_numpy(scores),
        },
    )
    mine = my_eval.eval_matches_epipolar(
        {
            "view0": {"camera": my_cam[0]},
            "view1": {"camera": my_cam[0]},
            "T_0to1": my_T[0],
        },
        {
            "keypoints0": kp0,
            "keypoints1": kp1,
            "matches0": m0,
            "matching_scores0": scores,
        },
    )
    for k in ("epi_prec@1e-4", "epi_prec@5e-4", "epi_prec@1e-3"):
        np.testing.assert_allclose(mine[k], float(ref[k]), atol=1e-6, err_msg=k)
    assert mine["num_matches"] == int(ref["num_matches"])
    assert float(mine["num_keypoints"]) == float(ref["num_keypoints"])


def test_eval_matches_depth_parity():
    rng = np.random.default_rng(2)
    depth0, depth1, k0, k1, ref_T, my_T, ref_cam, my_cam = _depth_setup(
        rng, B=1, N=32
    )
    N = k0.shape[1]
    m0, scores = _matches(rng, N, N, 20)

    # the reference consumes batched (B=1) depth/camera/pose here
    # (sample_depth expects (B, H, W); gt_matches_from_pose_depth adds the
    # batch dim only to the keypoints)
    ref_data = {
        "view0": {"camera": ref_cam, "depth": torch.from_numpy(depth0)},
        "view1": {"camera": ref_cam, "depth": torch.from_numpy(depth1)},
        "T_0to1": ref_T,
    }
    ref = ref_eval.eval_matches_depth(
        ref_data,
        {
            "keypoints0": torch.from_numpy(k0[0]),
            "keypoints1": torch.from_numpy(k1[0]),
            "matches0": torch.from_numpy(m0),
            "matching_scores0": torch.from_numpy(scores),
        },
    )
    mine = my_eval.eval_matches_depth(
        {
            "view0": {"camera": my_cam[0], "depth": depth0[0]},
            "view1": {"camera": my_cam[0], "depth": depth1[0]},
            "T_0to1": my_T[0],
        },
        {
            "keypoints0": k0[0],
            "keypoints1": k1[0],
            "matches0": m0,
            "matching_scores0": scores,
        },
    )
    for k in (
        "reproj_prec@1px",
        "reproj_prec@3px",
        "reproj_prec@5px",
        "covisible",
        "covisible_percent",
        "gt_match_recall@3px",
        "gt_match_precision@3px",
    ):
        np.testing.assert_allclose(
            mine[k], float(ref[k]), atol=1e-4, err_msg=k
        )


def test_eval_relative_pose_robust_opencv_parity():
    """Both sides drive cv2.findEssentialMat/recoverPose through their own
    wrapper logic (normalization, thresholds, candidate selection) on a
    clean synthetic correspondence set."""
    rng = np.random.default_rng(3)
    # enough surviving correspondences that the 5-point estimate is
    # well-conditioned (cv2's E from ~15 points is several degrees off even
    # on exact data)
    N = 300
    ref_T, my_T = rand_pose(rng, 1, t_scale=0.35)
    ref_cam, my_cam = make_cameras(rng, 1)

    # backproject pixels from view0 at random depths, transform, reproject
    f = np.asarray(my_cam.f)[0]
    c = np.asarray(my_cam.c)[0]
    p0 = rng.uniform([6, 6], [122, 90], (N, 2)).astype(np.float64)
    d = rng.uniform(4, 12, (N, 1))
    X0 = np.concatenate([(p0 - c) / f * d, d], -1)
    R = ref_T.R[0].numpy().astype(np.float64)
    t = ref_T.t[0].numpy().astype(np.float64)
    X1 = X0 @ R.T + t
    p1 = (X1[:, :2] / X1[:, 2:]) * f + c
    keep = (
        (p1 > 2).all(-1) & (p1 < [126, 94]).all(-1) & (X1[:, 2] > 0.1)
    )
    p0, p1 = p0[keep].astype(np.float32), p1[keep].astype(np.float32)
    assert keep.sum() >= 50

    conf = {"estimator": "opencv", "ransac_th": 1.0}
    import cv2

    m0 = np.arange(len(p0), dtype=np.int64)
    scores = np.ones(len(p0), np.float32)

    cv2.setRNGSeed(0)
    ref = ref_eval.eval_relative_pose_robust(
        {
            "view0": {"camera": ref_cam},
            "view1": {"camera": ref_cam},
            "T_0to1": ref_T[0],
        },
        {
            "keypoints0": torch.from_numpy(p0),
            "keypoints1": torch.from_numpy(p1),
            "matches0": torch.from_numpy(m0),
            "matching_scores0": torch.from_numpy(scores),
        },
        conf,
    )
    cv2.setRNGSeed(0)
    mine = my_eval.eval_relative_pose_robust(
        {
            "view0": {"camera": my_cam[0]},
            "view1": {"camera": my_cam[0]},
            "T_0to1": my_T[0],
        },
        {
            "keypoints0": p0,
            "keypoints1": p1,
            "matches0": m0,
            "matching_scores0": scores,
        },
        conf,
    )
    # a clean inlier set: both must recover the GT pose
    assert float(ref["rel_pose_error"]) < 0.5
    assert mine["rel_pose_error"] < 0.5
    np.testing.assert_allclose(
        mine["rel_pose_error"], float(ref["rel_pose_error"]), atol=0.2
    )
    assert abs(mine["ransac_inl"] - int(ref["ransac_inl"])) <= 2


def test_eval_poses_parity():
    rng = np.random.default_rng(4)
    auc_ths = [5, 10, 20]
    pose_results = {}
    for th in (0.5, 1.0, 2.0):
        errs = np.abs(rng.normal(0, 12, 50)).tolist()
        inls = rng.integers(10, 200, 50).astype(float).tolist()
        pose_results[th] = {"rel_pose_error": errs, "ransac_inl": inls}

    ref_sum, ref_best = ref_eval.eval_poses(
        {k: dict(v) for k, v in pose_results.items()}, auc_ths, "rel_pose_error"
    )
    my_sum, my_best = my_eval.eval_poses(
        {k: dict(v) for k, v in pose_results.items()}, auc_ths, "rel_pose_error"
    )
    assert my_best == ref_best
    assert set(my_sum) == set(ref_sum)
    for k in ref_sum:
        np.testing.assert_allclose(my_sum[k], ref_sum[k], atol=1e-9, err_msg=k)


def test_pr_helpers_parity():
    rng = np.random.default_rng(5)
    per_pair = {"tp": [], "fp": [], "scores": [], "num_pos": 0}
    ref_pair = {"tp": [], "fp": [], "scores": [], "num_pos": 0}
    for _ in range(4):
        N = 30
        gt = rng.integers(-2, 20, N)  # includes -2 IGNORE and -1 unmatched
        pred = np.where(rng.uniform(size=N) < 0.3, -1, rng.integers(0, 20, N))
        sc = rng.uniform(0, 1, N).astype(np.float32)
        tp, fp, scores, num_pos = my_eval.get_tp_fp_pts(pred, gt, sc)
        rtp, rfp, rscores, rnum = ref_eval.get_tp_fp_pts(pred, gt, sc)
        np.testing.assert_array_equal(tp, rtp)
        np.testing.assert_array_equal(fp, rfp)
        np.testing.assert_array_equal(scores, rscores)
        assert num_pos == rnum
        per_pair["tp"].append(tp)
        per_pair["fp"].append(fp)
        per_pair["scores"].append(scores)
        per_pair["num_pos"] += num_pos
        ref_pair["tp"].append(rtp)
        ref_pair["fp"].append(rfp)
        ref_pair["scores"].append(rscores)
        ref_pair["num_pos"] += rnum

    mine = my_eval.aggregate_pr_results(per_pair)
    ref = ref_eval.aggregate_pr_results(ref_pair)
    np.testing.assert_allclose(mine["AP"], ref["AP"], atol=1e-9)
    np.testing.assert_allclose(
        mine["curve_recall"], ref["curve_recall"], atol=1e-12
    )
    np.testing.assert_allclose(
        mine["curve_precision"], ref["curve_precision"], atol=1e-12
    )
