"""Unit tests for per-pair eval metrics (role of reference
`tests/test_eval_utils.py:30-88`): `eval_matches_homography` on synthetic
points — identity H, real H round-trip, injected outliers."""

import numpy as np

from gluefactory_tpu.eval.utils import (
    eval_matches_homography,
    homography_corner_error_np,
    sym_homography_error_np,
    warp_points_np,
)


def make_pred(kpts0, kpts1, n_matches=None):
    n = len(kpts0) if n_matches is None else n_matches
    matches0 = np.full(len(kpts0), -1, np.int64)
    matches0[:n] = np.arange(n)
    return {
        "keypoints0": kpts0.astype(np.float32),
        "keypoints1": kpts1.astype(np.float32),
        "matches0": matches0,
        "matching_scores0": np.ones(len(kpts0), np.float32),
    }


def test_identity_homography():
    rng = np.random.default_rng(0)
    kpts = rng.uniform(0, 480, (50, 2))
    data = {"H_0to1": np.eye(3, dtype=np.float32), "view0": {"image_size": np.array([480.0, 480.0])}}
    res = eval_matches_homography(data, make_pred(kpts, kpts))
    assert res["prec@1px"] == 1.0
    assert res["prec@3px"] == 1.0
    assert res["num_matches"] == 50


def test_real_homography_roundtrip():
    rng = np.random.default_rng(1)
    H = np.array([[1.05, 0.02, 10.0], [-0.01, 0.98, -5.0], [1e-5, 0.0, 1.0]])
    kpts0 = rng.uniform(50, 400, (40, 2))
    kpts1 = warp_points_np(kpts0, H)
    data = {"H_0to1": H.astype(np.float32)}
    res = eval_matches_homography(data, make_pred(kpts0, kpts1))
    assert res["prec@1px"] == 1.0


def test_outliers_lower_precision():
    rng = np.random.default_rng(2)
    H = np.eye(3)
    kpts0 = rng.uniform(0, 480, (40, 2))
    kpts1 = kpts0.copy()
    kpts1[:10] += 50.0  # 10 outliers
    data = {"H_0to1": H.astype(np.float32)}
    res = eval_matches_homography(data, make_pred(kpts0, kpts1))
    assert abs(res["prec@3px"] - 0.75) < 1e-6


def test_sym_homography_error():
    H = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    kpts0 = np.array([[10.0, 10.0]])
    kpts1 = np.array([[15.0, 10.0]])  # exactly H(kpts0)
    err = sym_homography_error_np(kpts0, kpts1, H)
    assert err[0] < 1e-9
    err2 = sym_homography_error_np(kpts0, kpts1 + [3.0, 0.0], H)
    assert abs(err2[0] - 3.0) < 1e-6


def test_corner_error():
    H = np.eye(3)
    H2 = H.copy()
    H2[0, 2] = 4.0  # pure 4px shift
    err = homography_corner_error_np(H2, H, np.array([640.0, 480.0]))
    assert abs(err - 4.0) < 1e-6
