"""Non-circular geometry parity: our jnp geometry core vs the EXECUTING
torch reference (pure torch, no shims needed beyond the loader) on random
inputs — warps, errors, epipolar distances, depth projection, and the GT
correspondence generators that supervise training."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.torchref

from torchref import load_reference  # noqa: E402

load_reference()

import gluefactory.geometry.depth as ref_depth  # noqa: E402
import gluefactory.geometry.epipolar as ref_epi  # noqa: E402
import gluefactory.geometry.gt_generation as ref_gt  # noqa: E402
import gluefactory.geometry.homography as ref_hom  # noqa: E402
from gluefactory.geometry.wrappers import Camera as RefCamera  # noqa: E402
from gluefactory.geometry.wrappers import Pose as RefPose  # noqa: E402

import gluefactory_tpu.geometry.depth as my_depth  # noqa: E402
import gluefactory_tpu.geometry.epipolar as my_epi  # noqa: E402
import gluefactory_tpu.geometry.gt_generation as my_gt  # noqa: E402
import gluefactory_tpu.geometry.homography as my_hom  # noqa: E402
from gluefactory_tpu.geometry.wrappers import Camera, Pose  # noqa: E402


def rand_H(rng, B):
    H = np.eye(3)[None].repeat(B, 0) + rng.normal(0, 0.05, (B, 3, 3))
    H[:, 0, 2] += rng.uniform(-20, 20, B)
    H[:, 1, 2] += rng.uniform(-20, 20, B)
    return H.astype(np.float32)


def rand_pose(rng, B, t_scale=1.0):
    aa = rng.normal(0, 0.2, (B, 3)).astype(np.float32)
    t = (rng.normal(0, t_scale, (B, 3))).astype(np.float32)
    ref = RefPose.from_aa(torch.from_numpy(aa), torch.from_numpy(t))
    R = ref.R.numpy()
    mine = Pose.from_Rt(jnp.asarray(R), jnp.asarray(t))
    return ref, mine


def make_cameras(rng, B, w=128, h=96):
    f = rng.uniform(80, 140, (B, 2)).astype(np.float32)
    c = np.stack([np.full(B, w / 2), np.full(B, h / 2)], -1).astype(np.float32)
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1] = f[:, 0], f[:, 1]
    K[:, 0, 2], K[:, 1, 2] = c[:, 0], c[:, 1]
    K[:, 2, 2] = 1.0
    ref = RefCamera.from_calibration_matrix(torch.from_numpy(K))
    mine = Camera(
        jnp.tile(jnp.asarray([[float(w), float(h)]]), (B, 1)),
        jnp.asarray(f),
        jnp.asarray(c),
    )
    return ref, mine


def test_warp_points_parity():
    rng = np.random.default_rng(0)
    B, N = 3, 40
    pts = rng.uniform(0, 100, (B, N, 2)).astype(np.float32)
    H = rand_H(rng, B)
    for inverse in (False, True):
        ref = ref_hom.warp_points_torch(
            torch.from_numpy(pts), torch.from_numpy(H), inverse=inverse
        ).numpy()
        mine = np.asarray(
            my_hom.warp_points(jnp.asarray(pts), jnp.asarray(H), inverse=inverse)
        )
        np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("difficulty,translation", [(1.0, 0.4), (0.8, 1.0), (0.5, 0.5), (0.0, 0.4)])
def test_sample_homography_corners_same_rng_parity(difficulty, translation):
    """Feeding both samplers the same RandomState must give identical
    H / corners over many seeds — pins the stage-1 training-data
    distribution to the reference's (homography.py:40-107)."""
    for seed in range(25):
        kwargs = dict(
            difficulty=difficulty,
            translation=translation,
            n_angles=10,
            max_angle=60,
            min_convexity=0.05,
        )
        H_r, full_r, warped_r, ps_r = ref_hom.sample_homography_corners(
            (640, 480), (320, 240), rng=np.random.RandomState(seed), **kwargs
        )
        H_m, full_m, warped_m, ps_m = my_hom.sample_homography_corners(
            (640, 480), (320, 240), rng=np.random.RandomState(seed), **kwargs
        )
        np.testing.assert_allclose(H_m, H_r, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(full_m, full_r)
        np.testing.assert_allclose(warped_m, warped_r, rtol=1e-4, atol=1e-3)
        assert tuple(ps_m) == tuple(ps_r)


def test_homography_errors_parity():
    rng = np.random.default_rng(1)
    B, N = 2, 30
    k0 = rng.uniform(0, 100, (B, N, 2)).astype(np.float32)
    k1 = rng.uniform(0, 100, (B, N, 2)).astype(np.float32)
    H = rand_H(rng, B)
    ref = ref_hom.sym_homography_error(
        torch.from_numpy(k0), torch.from_numpy(k1), torch.from_numpy(H)
    ).numpy()
    mine = np.asarray(
        my_hom.sym_homography_error(jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(H))
    )
    np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=5e-2)

    ref_all = ref_hom.sym_homography_error_all(
        torch.from_numpy(k0), torch.from_numpy(k1), torch.from_numpy(H)
    ).numpy()
    mine_all = np.asarray(
        my_hom.sym_homography_error_all(
            jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(H)
        )
    )
    np.testing.assert_allclose(mine_all, ref_all, rtol=1e-3, atol=5e-2)

    # the reference corner error is unbatched (image_size scalars) — compare
    # per item
    H2 = rand_H(rng, B)
    for b in range(B):
        ref_c = ref_hom.homography_corner_error(
            torch.from_numpy(H[b]), torch.from_numpy(H2[b]),
            torch.tensor([128.0, 96.0]),
        ).numpy()
        mine_c = np.asarray(
            my_hom.homography_corner_error(
                jnp.asarray(H[b : b + 1]),
                jnp.asarray(H2[b : b + 1]),
                jnp.asarray([[128.0, 96.0]]),
            )
        )[0]
        np.testing.assert_allclose(mine_c, ref_c, rtol=1e-3, atol=5e-2)


def test_epipolar_parity():
    rng = np.random.default_rng(2)
    B, N = 2, 25
    ref_T, my_T = rand_pose(rng, B)
    E_ref = ref_epi.T_to_E(ref_T).numpy()
    E_mine = np.asarray(my_epi.T_to_E(my_T))
    np.testing.assert_allclose(E_mine, E_ref, atol=1e-5)

    p0 = rng.normal(0, 1, (B, N, 2)).astype(np.float32)
    p1 = rng.normal(0, 1, (B, N, 2)).astype(np.float32)
    for squared in (True, False):
        ref = ref_epi.sym_epipolar_distance(
            torch.from_numpy(p0), torch.from_numpy(p1), torch.from_numpy(E_ref),
            squared=squared,
        ).numpy()
        mine = np.asarray(
            my_epi.sym_epipolar_distance(
                jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(E_ref), squared=squared
            )
        )
        np.testing.assert_allclose(mine, ref, atol=1e-4)

    ref_all = ref_epi.sym_epipolar_distance_all(
        torch.from_numpy(p0), torch.from_numpy(p1), torch.from_numpy(E_ref)
    ).numpy()
    mine_all = np.asarray(
        my_epi.sym_epipolar_distance_all(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(E_ref)
        )
    )
    np.testing.assert_allclose(mine_all, ref_all, atol=1e-4)


def test_relative_pose_error_parity():
    # the reference pose error is unbatched (R1.T trace) — compare per item
    rng = np.random.default_rng(3)
    B = 3
    ref_T, my_T = rand_pose(rng, B)
    ref_T2, my_T2 = rand_pose(rng, B)
    for b in range(B):
        ref_err = ref_epi.relative_pose_error(
            ref_T[b], ref_T2.R[b], ref_T2.t[b]
        )
        mine_err = my_epi.relative_pose_error(
            my_T[b : b + 1], my_T2.R[b : b + 1], my_T2.t[b : b + 1]
        )
        np.testing.assert_allclose(
            float(np.asarray(mine_err[0]).reshape(())),
            float(ref_err[0]), atol=1e-2,
        )  # t angular error (deg)
        np.testing.assert_allclose(
            float(np.asarray(mine_err[1]).reshape(())),
            float(ref_err[1]), atol=1e-2,
        )  # R angular error (deg)


def _depth_setup(rng, B=2, N=24, w=128, h=96):
    depth0 = rng.uniform(2.0, 6.0, (B, h, w)).astype(np.float32)
    depth1 = rng.uniform(2.0, 6.0, (B, h, w)).astype(np.float32)
    depth0[:, :10] = 0.0  # invalid band
    k0 = rng.uniform(2, [w - 2, h - 2], (B, N, 2)).astype(np.float32)
    k1 = rng.uniform(2, [w - 2, h - 2], (B, N, 2)).astype(np.float32)
    ref_T, my_T = rand_pose(rng, B, t_scale=0.3)
    ref_cam, my_cam = make_cameras(rng, B, w, h)
    return depth0, depth1, k0, k1, ref_T, my_T, ref_cam, my_cam


def test_sample_depth_and_project_parity():
    rng = np.random.default_rng(4)
    depth0, depth1, k0, k1, ref_T, my_T, ref_cam, my_cam = _depth_setup(rng)

    ref_d, ref_valid = ref_depth.sample_depth(
        torch.from_numpy(k0), torch.from_numpy(depth0)
    )
    my_d, my_valid = my_depth.sample_depth(jnp.asarray(k0), jnp.asarray(depth0))
    np.testing.assert_array_equal(np.asarray(my_valid), ref_valid.numpy())
    ok = ref_valid.numpy()
    np.testing.assert_allclose(
        np.asarray(my_d)[ok], ref_d.numpy()[ok], atol=1e-3
    )

    ref_p, ref_vis = ref_depth.project(
        torch.from_numpy(k0),
        ref_d,
        torch.from_numpy(depth1),
        ref_cam,
        ref_cam,
        ref_T,
        ref_valid,
    )
    my_p, my_vis = my_depth.project(
        jnp.asarray(k0), my_d, jnp.asarray(depth1), my_cam, my_cam, my_T, my_valid
    )
    np.testing.assert_array_equal(np.asarray(my_vis), ref_vis.numpy())
    vis = ref_vis.numpy()
    np.testing.assert_allclose(np.asarray(my_p)[vis], ref_p.numpy()[vis], atol=1e-2)


def test_gt_matches_from_homography_parity():
    rng = np.random.default_rng(5)
    B, M, N = 2, 32, 36
    k0 = rng.uniform(0, 100, (B, M, 2)).astype(np.float32)
    H = rand_H(rng, B)
    # half of kp1 are true correspondences, half random
    k0w = ref_hom.warp_points_torch(
        torch.from_numpy(k0), torch.from_numpy(H), inverse=False
    ).numpy()
    k1 = rng.uniform(0, 100, (B, N, 2)).astype(np.float32)
    k1[:, :16] = k0w[:, :16] + rng.normal(0, 1.0, (B, 16, 2))
    ref = ref_gt.gt_matches_from_homography(
        torch.from_numpy(k0), torch.from_numpy(k1), torch.from_numpy(H)
    )
    mine = my_gt.gt_matches_from_homography(
        jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(H)
    )
    agree0 = (np.asarray(mine["matches0"]) == ref["matches0"].numpy()).mean()
    agree1 = (np.asarray(mine["matches1"]) == ref["matches1"].numpy()).mean()
    # fp32 projection jitter can flip labels exactly at the px thresholds
    assert agree0 > 0.99 and agree1 > 0.99, (agree0, agree1)
    assert (np.asarray(mine["assignment"]) == ref["assignment"].numpy()).mean() > 0.999


def test_gt_matches_from_pose_depth_parity():
    rng = np.random.default_rng(6)
    depth0, depth1, k0, k1, ref_T, my_T, ref_cam, my_cam = _depth_setup(rng)
    B = depth0.shape[0]
    data = {
        "view0": {
            "camera": ref_cam,
            "depth": torch.from_numpy(depth0),
        },
        "view1": {
            "camera": ref_cam,
            "depth": torch.from_numpy(depth1),
        },
        "T_0to1": ref_T,
    }
    ref = ref_gt.gt_matches_from_pose_depth(
        torch.from_numpy(k0), torch.from_numpy(k1), data
    )
    mine = my_gt.gt_matches_from_pose_depth(
        jnp.asarray(k0),
        jnp.asarray(k1),
        my_cam,
        my_cam,
        my_T,
        jnp.asarray(depth0),
        jnp.asarray(depth1),
    )
    agree0 = (np.asarray(mine["matches0"]) == ref["matches0"].numpy()).mean()
    agree1 = (np.asarray(mine["matches1"]) == ref["matches1"].numpy()).mean()
    # fp32 projection jitter can flip labels exactly at the px thresholds
    assert agree0 > 0.99 and agree1 > 0.99, (agree0, agree1)
    assert (np.asarray(mine["assignment"]) == ref["assignment"].numpy()).mean() > 0.999


def _make_line_set(rng, B, L, w, h):
    p0 = rng.uniform(8, [w - 8, h - 8], (B, L, 2)).astype(np.float32)
    d = rng.uniform(-25, 25, (B, L, 2)).astype(np.float32)
    return np.stack([p0, np.clip(p0 + d, 0, [w - 1, h - 1])], axis=2).astype(
        np.float32
    )


def test_gt_line_matches_from_homography_parity():
    rng = np.random.default_rng(8)
    B, L0, L1, w, h = 2, 12, 14, 128, 96
    lines0 = _make_line_set(rng, B, L0, w, h)
    H = rand_H(rng, B)
    # half of lines1 are warped copies of lines0, the rest random
    w0 = ref_hom.warp_points_torch(
        torch.from_numpy(lines0.reshape(B, -1, 2)), torch.from_numpy(H)
    ).numpy().reshape(B, L0, 2, 2)
    lines1 = _make_line_set(rng, B, L1, w, h)
    lines1[:, :7] = w0[:, :7] + rng.normal(0, 0.5, (B, 7, 2, 2))
    valid0 = rng.uniform(size=(B, L0)) > 0.15
    valid1 = rng.uniform(size=(B, L1)) > 0.15
    npts, dist_th, ov_th, vis_th = 16, 5.0, 0.2, 0.5

    pos_r, m0_r, m1_r = ref_gt.gt_line_matches_from_homography(
        torch.from_numpy(lines0), torch.from_numpy(lines1),
        torch.from_numpy(valid0), torch.from_numpy(valid1),
        (1, h, w), (1, h, w), torch.from_numpy(H),
        npts, dist_th, ov_th, vis_th,
    )
    import gluefactory_tpu.geometry.gt_lines as my_gtl
    mine = my_gtl.gt_line_matches_from_homography(
        jnp.asarray(lines0), jnp.asarray(lines1),
        jnp.asarray(valid0), jnp.asarray(valid1), (h, w), (h, w),
        jnp.asarray(H), n_samples=npts, perp_dist_th=dist_th,
        overlap_th=ov_th, min_visibility_th=vis_th,
    )
    agree0 = (np.asarray(mine["matches0"]) == m0_r.numpy()).mean()
    agree1 = (np.asarray(mine["matches1"]) == m1_r.numpy()).mean()
    # fp32 jitter can flip individual close-sample counts at thresholds;
    # assignment ties resolve differently between Hungarian and auction
    assert agree0 >= 0.9 and agree1 >= 0.9, (agree0, agree1)
    assert (np.asarray(mine["assignment"]) == pos_r.numpy()).mean() > 0.98


def test_gt_line_matches_from_pose_depth_parity():
    rng = np.random.default_rng(9)
    B, L0, L1, w, h = 2, 10, 12, 128, 96
    depth0 = rng.uniform(3.0, 6.0, (B, h, w)).astype(np.float32)
    depth1 = rng.uniform(3.0, 6.0, (B, h, w)).astype(np.float32)
    depth0[:, :8] = 0.0
    lines0 = _make_line_set(rng, B, L0, w, h)
    lines1 = _make_line_set(rng, B, L1, w, h)
    ref_T, my_T = rand_pose(rng, B, t_scale=0.2)
    ref_cam, my_cam = make_cameras(rng, B, w, h)
    npts, dist_th, ov_th, vis_th = 16, 5.0, 0.2, 0.5
    valid0 = rng.uniform(size=(B, L0)) > 0.1
    valid1 = rng.uniform(size=(B, L1)) > 0.1

    data = {
        "view0": {
            "camera": ref_cam,
            "depth": torch.from_numpy(depth0),
            "image": torch.zeros(B, 1, h, w),
        },
        "view1": {
            "camera": ref_cam,
            "depth": torch.from_numpy(depth1),
            "image": torch.zeros(B, 1, h, w),
        },
        "T_0to1": ref_T,
        "T_1to0": ref_T.inv(),
    }
    pos_r, m0_r, m1_r = ref_gt.gt_line_matches_from_pose_depth(
        torch.from_numpy(lines0), torch.from_numpy(lines1),
        torch.from_numpy(valid0), torch.from_numpy(valid1),
        data, npts, dist_th, ov_th, vis_th,
    )

    import gluefactory_tpu.geometry.gt_lines as my_gtl
    mine = my_gtl.gt_line_matches_from_pose_depth(
        jnp.asarray(lines0), jnp.asarray(lines1),
        jnp.asarray(valid0), jnp.asarray(valid1),
        my_cam, my_cam, my_T, jnp.asarray(depth0), jnp.asarray(depth1),
        shape0=(h, w), shape1=(h, w),
        n_samples=npts, perp_dist_th=dist_th,
        overlap_th=ov_th, min_visibility_th=vis_th,
    )
    agree0 = (np.asarray(mine["matches0"]) == m0_r.numpy()).mean()
    agree1 = (np.asarray(mine["matches1"]) == m1_r.numpy()).mean()
    assert agree0 >= 0.9 and agree1 >= 0.9, (agree0, agree1)
    assert (np.asarray(mine["assignment"]) == pos_r.numpy()).mean() > 0.98
