import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry import Camera, Pose
from gluefactory_tpu.geometry.depth import sample_depth, symmetric_reprojection_error
from gluefactory_tpu.geometry.epipolar import (
    T_to_E,
    relative_pose_error,
    sym_epipolar_distance_all,
)
from gluefactory_tpu.geometry.gt_generation import (
    gt_matches_from_homography,
    gt_matches_from_pose_depth,
)
from gluefactory_tpu.geometry.homography import (
    compute_homography_dlt,
    compute_homography_np,
    homography_corner_error,
    sample_homography_corners,
    sym_homography_error,
    warp_points,
)
from gluefactory_tpu.geometry.utils import so3exp_map


def rand_rotation(rng):
    aa = rng.normal(size=3) * 0.5
    return np.asarray(so3exp_map(jnp.asarray(aa, jnp.float32)))


def test_pose_compose_inv():
    rng = np.random.default_rng(0)
    R1, R2 = rand_rotation(rng), rand_rotation(rng)
    t1, t2 = rng.normal(size=3), rng.normal(size=3)
    p1 = Pose.from_Rt(jnp.asarray(R1, jnp.float32), jnp.asarray(t1, jnp.float32))
    p2 = Pose.from_Rt(jnp.asarray(R2, jnp.float32), jnp.asarray(t2, jnp.float32))
    comp = p1 @ p2
    pts = jnp.asarray(rng.normal(size=(1, 5, 3)), jnp.float32)
    a = comp.transform(pts)
    b = p1.transform(p2.transform(pts))
    np.testing.assert_allclose(a, b, atol=1e-5)
    ident = (p1 @ p1.inv()).matrix()
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)


def test_pose_magnitude():
    aa = jnp.asarray([0.0, 0.0, np.deg2rad(30.0)], jnp.float32)
    p = Pose.from_aa(aa, jnp.zeros(3))
    dr, dt = p.magnitude()
    np.testing.assert_allclose(dr, 30.0, atol=1e-4)
    np.testing.assert_allclose(dt, 0.0, atol=1e-6)


def test_pose_pytree():
    p = Pose.identity((4,))
    mapped = jax.tree.map(lambda x: x * 2, p)
    assert isinstance(mapped, Pose)
    assert mapped.R[0, 0, 0] == 2.0


def test_camera_roundtrip():
    cam = Camera(
        size=jnp.asarray([[640.0, 480.0]]),
        f=jnp.asarray([[500.0, 510.0]]),
        c=jnp.asarray([[320.0, 240.0]]),
    )
    p3d = jnp.asarray([[[0.1, -0.2, 2.0], [0.0, 0.0, 1.0], [1.0, 1.0, 4.0]]])
    p2d, valid = cam.cam2image(p3d)
    assert valid.all()
    rays = cam.image2cam(p2d)
    p3d_rec = rays * p3d[..., 2:3]
    np.testing.assert_allclose(p3d_rec, p3d, atol=1e-4)


def test_camera_in_image_and_scale():
    cam = Camera(
        size=jnp.asarray([[100.0, 80.0]]),
        f=jnp.asarray([[50.0, 50.0]]),
        c=jnp.asarray([[50.0, 40.0]]),
    )
    pts = jnp.asarray([[[5.0, 5.0], [150.0, 5.0]]])
    inside = cam.in_image(pts)
    assert bool(inside[0, 0]) and not bool(inside[0, 1])
    cam2 = cam.scale(2.0)
    np.testing.assert_allclose(cam2.f, cam.f * 2)


def test_homography_np_exact():
    rng = np.random.default_rng(1)
    H_gt = np.array([[1.1, 0.05, 3.0], [-0.02, 0.95, -2.0], [1e-4, -5e-5, 1.0]])
    pts = rng.uniform(0, 100, size=(8, 2))
    pts_h = np.concatenate([pts, np.ones((8, 1))], axis=1) @ H_gt.T
    pts2 = pts_h[:, :2] / pts_h[:, 2:]
    H = compute_homography_np(pts, pts2)
    np.testing.assert_allclose(H / H[2, 2], H_gt / H_gt[2, 2], atol=1e-4)


def test_warp_points_identity_and_roundtrip():
    H = jnp.eye(3)[None]
    pts = jnp.asarray([[[10.0, 20.0], [30.0, 5.0]]])
    np.testing.assert_allclose(warp_points(pts, H), pts, atol=1e-6)
    H2 = jnp.asarray(
        [[[1.2, 0.1, 5.0], [0.0, 0.9, -3.0], [1e-4, 0.0, 1.0]]], jnp.float32
    )
    fwd = warp_points(pts, H2)
    back = warp_points(fwd, H2, inverse=True)
    np.testing.assert_allclose(back, pts, atol=1e-3)
    err = sym_homography_error(pts, fwd, H2[0])
    np.testing.assert_allclose(err, 0.0, atol=1e-3)


def test_compute_homography_dlt_batched():
    rng = np.random.default_rng(2)
    H_gt = np.stack(
        [
            np.array([[1.0, 0.0, 10.0], [0.0, 1.0, -5.0], [0.0, 0.0, 1.0]]),
            np.array([[0.9, 0.1, 0.0], [-0.1, 1.1, 2.0], [1e-4, 0.0, 1.0]]),
        ]
    )
    pts0 = rng.uniform(0, 200, size=(2, 16, 2))
    pts1 = np.asarray(warp_points(jnp.asarray(pts0, jnp.float32), jnp.asarray(H_gt, jnp.float32)))
    H = compute_homography_dlt(jnp.asarray(pts0, jnp.float32), jnp.asarray(pts1, jnp.float32))
    err = homography_corner_error(H, jnp.asarray(H_gt, jnp.float32), jnp.asarray([[200.0, 200.0]] * 2))
    assert np.asarray(err).max() < 0.5


def test_sample_homography_corners():
    rng = np.random.default_rng(3)
    H, frame, warped, patch_shape = sample_homography_corners(
        (640, 480), (320, 240), difficulty=0.5, rng=rng
    )
    # the returned warped corners are the frame corners pushed through H
    check = np.asarray(
        warp_points(jnp.asarray(frame[None], jnp.float32), jnp.asarray(H[None]))
    )
    np.testing.assert_allclose(check[0], warped, atol=0.5)
    assert tuple(patch_shape) == (320, 240)
    # difficulty 0 degenerates to the pure frame->patch scaling
    H0, frame0, warped0, _ = sample_homography_corners(
        (640, 480), (320, 240), difficulty=0.0, rng=rng
    )
    np.testing.assert_allclose(
        warped0, np.array([[0, 0], [0, 240], [320, 240], [320, 0]]), atol=1e-3
    )


def test_epipolar_distance_zero_on_gt():
    rng = np.random.default_rng(4)
    R = rand_rotation(rng)
    t = np.array([1.0, 0.2, -0.1])
    T = Pose.from_Rt(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
    p3d = rng.uniform(-1, 1, size=(20, 3)) + np.array([0, 0, 4.0])
    p0 = p3d[:, :2] / p3d[:, 2:]
    p3d_1 = (R @ p3d.T).T + t
    p1 = p3d_1[:, :2] / p3d_1[:, 2:]
    E = T_to_E(T)
    D = sym_epipolar_distance_all(
        jnp.asarray(p0[None], jnp.float32), jnp.asarray(p1[None], jnp.float32), E[None]
    )
    diag = jnp.diagonal(D[0])
    assert float(jnp.abs(diag).max()) < 1e-4


def test_relative_pose_error():
    T = Pose.from_aa(jnp.asarray([0.0, 0.0, 0.1]), jnp.asarray([1.0, 0.0, 0.0]))
    t_err, r_err = relative_pose_error(T, T.R, T.t)
    assert float(r_err) < 1e-3 and float(t_err) < 1e-3
    _, r_err2 = relative_pose_error(T, jnp.eye(3), T.t)
    np.testing.assert_allclose(float(r_err2), np.rad2deg(0.1), atol=1e-3)


def test_sample_depth():
    depth = jnp.ones((1, 10, 10)) * 2.0
    depth = depth.at[0, :, 5:].set(jnp.nan)
    pts = jnp.asarray([[[2.5, 2.5], [8.5, 8.5], [-1.0, 2.0]]])
    d, valid = sample_depth(pts, depth)
    assert float(d[0, 0]) == 2.0 and bool(valid[0, 0])
    assert not bool(valid[0, 1])  # NaN region
    assert not bool(valid[0, 2])  # out of bounds


def make_two_view(rng, n=32, h=64, w=64):
    f = 100.0
    cam = Camera(
        size=jnp.asarray([[float(w), float(h)]]),
        f=jnp.asarray([[f, f]]),
        c=jnp.asarray([[w / 2.0, h / 2.0]]),
    )
    R = rand_rotation(rng) * 0.0 + np.eye(3)
    t = np.array([0.2, 0.0, 0.0])
    T = Pose.from_Rt(jnp.asarray(R, jnp.float32), jnp.asarray(t[None], jnp.float32).squeeze(0))
    T = Pose(T.R[None], T.t[None])
    # flat fronto-parallel plane at depth 5 -> depth maps constant
    depth0 = jnp.full((1, h, w), 5.0)
    depth1 = jnp.full((1, h, w), 5.0)
    return cam, T, depth0, depth1


def test_gt_matches_from_pose_depth():
    rng = np.random.default_rng(5)
    cam, T, depth0, depth1 = make_two_view(rng)
    kp0 = jnp.asarray(rng.uniform(10, 54, size=(1, 16, 2)), jnp.float32)
    # project kp0 into view 1 exactly: 3D = ray * 5, shift by t, project
    p3d = cam.image2cam(kp0) * 5.0
    p3d_1 = T.transform(p3d)
    kp1_exact, valid = cam.cam2image(p3d_1)
    out = gt_matches_from_pose_depth(kp0, kp1_exact, cam, cam, T, depth0, depth1)
    m0 = np.asarray(out["matches0"][0])
    v = np.asarray(valid[0])
    expected = np.where(v, np.arange(16), m0)
    np.testing.assert_array_equal(m0[v], expected[v])
    assert np.asarray(out["assignment"]).sum() == v.sum()


def test_gt_matches_from_homography():
    rng = np.random.default_rng(6)
    H = jnp.asarray(
        [[[1.0, 0.02, 5.0], [0.01, 1.0, -3.0], [0.0, 0.0, 1.0]]], jnp.float32
    )
    kp0 = jnp.asarray(rng.uniform(0, 400, size=(1, 24, 2)), jnp.float32)
    kp1 = warp_points(kp0, H)
    out = gt_matches_from_homography(kp0, kp1, H)
    np.testing.assert_array_equal(np.asarray(out["matches0"][0]), np.arange(24))
    np.testing.assert_array_equal(np.asarray(out["matches1"][0]), np.arange(24))
    # far-away points are negatives
    kp1_shift = kp1 + 100.0
    out2 = gt_matches_from_homography(kp0, kp1_shift, H)
    assert (np.asarray(out2["matches0"]) == -1).all()


def test_gt_matches_mask_inertness():
    """Masked (padding) keypoint slots — e.g. wireframe's invalid junction
    slots, which all sit at (0,0) in both views — must never become GT
    positives, must be labelled IGNORE (-2), and must not disturb the labels
    of valid keypoints."""
    rng = np.random.default_rng(8)
    H = jnp.asarray(
        [[[1.0, 0.02, 5.0], [0.01, 1.0, -3.0], [0.0, 0.0, 1.0]]], jnp.float32
    )
    kp0 = jnp.asarray(rng.uniform(50, 400, size=(1, 16, 2)), jnp.float32)
    kp1 = warp_points(kp0, H)
    # append 8 padding slots at (0, 0) on both sides — (0,0) maps near (0,0),
    # so without masks these would cross-match as positives
    pad = jnp.zeros((1, 8, 2), jnp.float32)
    kp0p = jnp.concatenate([kp0, pad], axis=1)
    kp1p = jnp.concatenate([kp1, pad], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 16), bool), jnp.zeros((1, 8), bool)], axis=1)

    ref = gt_matches_from_homography(kp0, kp1, H)
    out = gt_matches_from_homography(kp0p, kp1p, H, mask0=mask, mask1=mask)
    # valid slots: identical labels to the unpadded call
    np.testing.assert_array_equal(
        np.asarray(out["matches0"])[0, :16], np.asarray(ref["matches0"])[0]
    )
    # padding slots: IGNORE, never positive
    assert (np.asarray(out["matches0"])[0, 16:] == -2).all()
    assert (np.asarray(out["matches1"])[0, 16:] == -2).all()
    assert not np.asarray(out["assignment"])[0, 16:].any()
    assert not np.asarray(out["assignment"])[0, :, 16:].any()

    # without masks the (0,0) slots DO cross-match — the failure mode guarded
    # (identity H: the padding slots coincide exactly across views)
    H_id = jnp.eye(3, dtype=jnp.float32)[None]
    kp1_id = jnp.concatenate([kp0, pad], axis=1)
    bad = gt_matches_from_homography(kp0p, kp1_id, H_id)
    assert np.asarray(bad["assignment"])[0, 16:, 16:].any()
    good = gt_matches_from_homography(kp0p, kp1_id, H_id, mask0=mask, mask1=mask)
    assert not np.asarray(good["assignment"])[0, 16:, 16:].any()


def test_gt_matches_pose_depth_mask_inertness():
    rng = np.random.default_rng(9)
    cam, T, depth0, depth1 = make_two_view(rng)
    kp0 = jnp.asarray(rng.uniform(10, 54, size=(1, 12, 2)), jnp.float32)
    p3d = cam.image2cam(kp0) * 5.0
    kp1, valid = cam.cam2image(T.transform(p3d))
    pad = jnp.full((1, 4, 2), 32.0, jnp.float32)  # in-image padding slots
    kp0p = jnp.concatenate([kp0, pad], axis=1)
    kp1p = jnp.concatenate([kp1, pad], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 12), bool), jnp.zeros((1, 4), bool)], axis=1)
    out = gt_matches_from_pose_depth(
        kp0p, kp1p, cam, cam, T, depth0, depth1, mask0=mask, mask1=mask
    )
    assert (np.asarray(out["matches0"])[0, 12:] == -2).all()
    assert not np.asarray(out["assignment"])[0, 12:].any()
    # valid slots keep their positives
    m0 = np.asarray(out["matches0"])[0, :12]
    v = np.asarray(valid[0])
    np.testing.assert_array_equal(m0[v], np.arange(12)[v])


def test_symmetric_reprojection_error_zero():
    rng = np.random.default_rng(7)
    cam, T, depth0, depth1 = make_two_view(rng)
    kp0 = jnp.asarray(rng.uniform(10, 54, size=(1, 8, 2)), jnp.float32)
    p3d = cam.image2cam(kp0) * 5.0
    kp1, valid = cam.cam2image(T.transform(p3d))
    err, v = symmetric_reprojection_error(kp0, kp1, cam, cam, T, depth0, depth1)
    err = np.asarray(err)[np.asarray(v & valid)]
    assert err.max() < 1e-2


def test_pose_camera_pytree_unflatten_is_structural():
    """tree_unflatten must be purely structural (jax unflattens with
    ArgInfo placeholders during jit .lower(), tracers under transforms, and
    arbitrary leaves under tree_map) — an __init__ that calls jnp.asarray
    breaks AOT lowering of any function whose args carry Pose/Camera
    (hit by scripts_dev/profile_stage2.py)."""
    T = Pose.from_4x4mat(jnp.eye(4))
    cam = Camera(
        jnp.asarray([64.0, 48.0]), jnp.asarray([50.0, 50.0]),
        jnp.asarray([32.0, 24.0]),
    )

    # round-trip preserves leaves
    for obj in (T, cam):
        leaves, treedef = jax.tree_util.tree_flatten(obj)
        obj2 = jax.tree_util.tree_unflatten(treedef, leaves)
        for a, b in zip(leaves, jax.tree_util.tree_flatten(obj2)[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-array placeholders survive unflatten (the actual contract)
    _, treedef = jax.tree_util.tree_flatten(T)
    jax.tree_util.tree_unflatten(treedef, [object(), object()])

    # AOT lowering over a batch carrying Pose/Camera works end-to-end
    def fn(batch):
        p3d = batch["camera"].image2cam(batch["kp"]) * 2.0
        return batch["T"].transform(p3d).sum()

    batch = {"camera": cam, "T": T, "kp": jnp.ones((1, 4, 2))}
    compiled = jax.jit(fn).lower(batch).compile()
    assert np.isfinite(float(compiled(batch)))
