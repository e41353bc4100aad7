import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.geometry.homography import warp_points
from gluefactory_tpu.geometry.wrappers import Camera, Pose
from gluefactory_tpu.geometry.epipolar import relative_pose_error
from gluefactory_tpu.ops.ransac import ransac_essential, ransac_homography
from gluefactory_tpu.robust_estimators import load_estimator


def make_homography_data(n_in=60, n_out=40, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    H_gt = np.array(
        [[1.1, 0.08, 20.0], [-0.05, 0.95, -10.0], [1e-4, -5e-5, 1.0]], np.float32
    )
    pts0 = rng.uniform(0, 480, (n_in + n_out, 2)).astype(np.float32)
    pts1 = np.array(warp_points(jnp.asarray(pts0[None]), jnp.asarray(H_gt[None])))[0]
    pts1[:n_in] += rng.normal(0, noise, (n_in, 2))
    pts1[n_in:] = rng.uniform(0, 480, (n_out, 2))  # outliers
    return pts0, pts1.astype(np.float32), H_gt


def test_ransac_homography_recovers():
    pts0, pts1, H_gt = make_homography_data()
    valid = np.ones(len(pts0), bool)
    out = ransac_homography(
        jnp.asarray(pts0), jnp.asarray(pts1), jnp.asarray(valid), 3.0,
        jax.random.key(0), n_iters=512,
    )
    assert bool(out["success"])
    assert int(out["num_inliers"]) >= 50
    H = np.asarray(out["M_0to1"])
    H = H / H[2, 2]
    # corner error vs gt
    corners = jnp.asarray([[[0.0, 0], [480, 0], [480, 480], [0, 480]]], jnp.float32)
    err = np.abs(
        np.asarray(warp_points(corners, jnp.asarray(H[None])))
        - np.asarray(warp_points(corners, jnp.asarray(H_gt[None])))
    ).max()
    assert err < 3.0, err


def test_xla_homography_estimator():
    pts0, pts1, H_gt = make_homography_data(seed=1)
    est = load_estimator("homography", "xla_ransac")({"ransac_th": 3.0})
    out = est({"m_kpts0": pts0, "m_kpts1": pts1})
    assert out["success"]
    assert out["inliers"].sum() >= 50


def test_opencv_homography_estimator():
    pts0, pts1, H_gt = make_homography_data(seed=2)
    est = load_estimator("homography", "opencv")({"ransac_th": 3.0})
    out = est({"m_kpts0": pts0, "m_kpts1": pts1})
    assert out["success"]
    assert out["inliers"].sum() >= 40


def make_epipolar_data(n_in=100, n_out=50, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    from gluefactory_tpu.geometry.utils import so3exp_map

    R = np.asarray(so3exp_map(jnp.asarray([0.05, -0.1, 0.03], jnp.float32)))
    t = np.array([1.0, 0.15, 0.1], np.float32)
    t = t / np.linalg.norm(t)
    f, cx, cy = 500.0, 320.0, 240.0
    cam = Camera(
        size=jnp.asarray([640.0, 480.0]), f=jnp.asarray([f, f]), c=jnp.asarray([cx, cy])
    )
    p3d = rng.uniform(-2, 2, (n_in, 3)).astype(np.float32) + np.array([0, 0, 6.0], np.float32)
    p0 = p3d[:, :2] / p3d[:, 2:] * f + np.array([cx, cy])
    p3d_1 = p3d @ R.T + t
    p1 = p3d_1[:, :2] / p3d_1[:, 2:] * f + np.array([cx, cy])
    p0 = p0 + rng.normal(0, noise, p0.shape)
    p1 = p1 + rng.normal(0, noise, p1.shape)
    out0 = rng.uniform(0, 640, (n_out, 2))
    out1 = rng.uniform(0, 640, (n_out, 2))
    kpts0 = np.concatenate([p0, out0]).astype(np.float32)
    kpts1 = np.concatenate([p1, out1]).astype(np.float32)
    T_gt = Pose.from_Rt(jnp.asarray(R), jnp.asarray(t))
    return kpts0, kpts1, cam, T_gt


@pytest.mark.slow
def test_ransac_essential_recovers():
    kpts0, kpts1, cam, T_gt = make_epipolar_data()
    p0 = np.asarray(cam.normalize(jnp.asarray(kpts0[None])))[0]
    p1 = np.asarray(cam.normalize(jnp.asarray(kpts1[None])))[0]
    valid = np.ones(len(p0), bool)
    out = ransac_essential(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(valid), 1.5 / 500.0,
        jax.random.key(0), n_iters=2048,
    )
    assert bool(out["success"])
    t_err, r_err = relative_pose_error(T_gt, out["R"], out["t"])
    assert float(r_err) < 2.0, float(r_err)
    assert float(t_err) < 5.0, float(t_err)


@pytest.mark.slow
def test_xla_relative_pose_estimator():
    kpts0, kpts1, cam, T_gt = make_epipolar_data(seed=3)
    est = load_estimator("relative_pose", "xla_ransac")({"ransac_th": 1.5})
    out = est({"m_kpts0": kpts0, "m_kpts1": kpts1, "camera0": cam, "camera1": cam})
    assert out["success"]
    t_err, r_err = relative_pose_error(T_gt, out["M_0to1"].R, out["M_0to1"].t)
    assert float(r_err) < 2.0
    assert float(t_err) < 5.0


def test_opencv_relative_pose_estimator():
    kpts0, kpts1, cam, T_gt = make_epipolar_data(seed=4)
    est = load_estimator("relative_pose", "opencv")({"ransac_th": 1.5})
    out = est({"m_kpts0": kpts0, "m_kpts1": kpts1, "camera0": cam, "camera1": cam})
    assert out["success"]
    t_err, r_err = relative_pose_error(T_gt, out["M_0to1"].R, out["M_0to1"].t)
    assert float(r_err) < 2.0
    assert float(t_err) < 5.0


def test_native_homography_estimator():
    pts0, pts1, H_gt = make_homography_data(seed=5)
    est = load_estimator("homography", "poselib")({"ransac_th": 3.0})
    out = est({"m_kpts0": pts0, "m_kpts1": pts1})
    assert out["success"]
    assert out["inliers"].sum() >= 50
    import jax.numpy as jnp
    corners = jnp.asarray([[[0.0, 0], [480, 0], [480, 480], [0, 480]]], jnp.float32)
    err = np.abs(
        np.asarray(warp_points(corners, jnp.asarray(out["M_0to1"][None])))
        - np.asarray(warp_points(corners, jnp.asarray(H_gt[None].astype(np.float32))))
    ).max()
    assert err < 3.0, err


def test_native_relative_pose_estimator():
    kpts0, kpts1, cam, T_gt = make_epipolar_data(seed=6)
    est = load_estimator("relative_pose", "poselib")({"ransac_th": 1.5})
    out = est({"m_kpts0": kpts0, "m_kpts1": kpts1, "camera0": cam, "camera1": cam})
    assert out["success"]
    t_err, r_err = relative_pose_error(T_gt, out["M_0to1"].R, out["M_0to1"].t)
    assert float(r_err) < 2.0, float(r_err)
    assert float(t_err) < 5.0, float(t_err)


def test_native_two_view_estimator_general_scene():
    """COLMAP-style model selection picks the essential-matrix pose for a
    general 3D scene."""
    kpts0, kpts1, cam, T_gt = make_epipolar_data(seed=5)
    est = load_estimator("relative_pose", "two_view_native")({"ransac_th": 1.5})
    out = est({"m_kpts0": kpts0, "m_kpts1": kpts1, "camera0": cam, "camera1": cam})
    assert out["success"]
    t_err, r_err = relative_pose_error(T_gt, out["M_0to1"].R, out["M_0to1"].t)
    assert float(r_err) < 2.0
    assert float(t_err) < 5.0


@pytest.mark.slow
def test_native_two_view_estimator_planar_scene():
    """A purely planar scene routes through the homography-decomposition
    pose path and still recovers R/t."""
    rng = np.random.default_rng(7)
    from gluefactory_tpu.geometry.utils import so3exp_map

    R = np.asarray(so3exp_map(jnp.asarray([0.06, -0.08, 0.02], jnp.float32)))
    t = np.array([0.8, 0.1, 0.05], np.float32)
    t = t / np.linalg.norm(t)
    f, cx, cy = 500.0, 320.0, 240.0
    cam = Camera(
        size=jnp.asarray([640.0, 480.0]), f=jnp.asarray([f, f]), c=jnp.asarray([cx, cy])
    )
    # all points on the plane z = 5 (in view-0 coordinates)
    xy = rng.uniform(-2, 2, (120, 2)).astype(np.float32)
    p3d = np.concatenate([xy, np.full((120, 1), 5.0, np.float32)], axis=1)
    p0 = p3d[:, :2] / p3d[:, 2:] * f + np.array([cx, cy])
    p3d_1 = p3d @ R.T + t
    p1 = p3d_1[:, :2] / p3d_1[:, 2:] * f + np.array([cx, cy])
    p0 = (p0 + rng.normal(0, 0.2, p0.shape)).astype(np.float32)
    p1 = (p1 + rng.normal(0, 0.2, p1.shape)).astype(np.float32)
    T_gt = Pose.from_Rt(jnp.asarray(R), jnp.asarray(t))

    est = load_estimator("relative_pose", "two_view_native")({"ransac_th": 2.0})
    out = est({"m_kpts0": p0, "m_kpts1": p1, "camera0": cam, "camera1": cam})
    assert out["success"]
    t_err, r_err = relative_pose_error(T_gt, out["M_0to1"].R, out["M_0to1"].t)
    assert float(r_err) < 3.0, float(r_err)
    assert float(t_err) < 10.0, float(t_err)
