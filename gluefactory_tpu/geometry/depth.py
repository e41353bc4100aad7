"""Depth sampling and two-view reprojection (role of reference `geometry/depth.py`).

NaN-aware bilinear depth sampling + the `project` chain
image -> cam -> transform -> cam -> image with validity and optional
cycle-consistency. Pure jnp, batched over (B, N) points.
"""

from __future__ import annotations

import jax.numpy as jnp

from .wrappers import Camera, Pose


def sample_depth_bilinear(pts: jnp.ndarray, depth: jnp.ndarray):
    """Sample a (B, H, W) depth map at (B, N, 2) pixel points.

    Reference-exact semantics (`depth.py:8-25`): invalid pixels (depth <= 0
    or non-finite) poison the bilinear interpolation (grid_sample over a
    NaN-masked map); where poisoned, fall back to the NEAREST neighbor
    sample. Out-of-image support pixels contribute 0 (grid_sample zero
    padding), not NaN. A point is valid if its final value is finite and > 0.
    Returns (depth (B, N), valid (B, N)).
    """
    B, H, W = depth.shape
    # COLMAP convention: pixel center at (0.5, 0.5) -> array index p - 0.5
    x = pts[..., 0] - 0.5
    y = pts[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def gather(yy, xx):
        # value: 0 outside the image (zero padding); inside: the pixel value
        # with poisoned=True where it is invalid (<= 0 or non-finite).
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        xx_c = jnp.clip(xx, 0, W - 1)
        yy_c = jnp.clip(yy, 0, H - 1)
        d = jnp.take_along_axis(depth.reshape(B, H * W), yy_c * W + xx_c, axis=-1)
        poisoned = inb & ~(jnp.isfinite(d) & (d > 0))
        return jnp.where(inb, jnp.where(poisoned, 0.0, d), 0.0), poisoned

    d00, p00 = gather(y0, x0)
    d01, p01 = gather(y0, x0 + 1)
    d10, p10 = gather(y0 + 1, x0)
    d11, p11 = gather(y0 + 1, x0 + 1)
    bilin = (
        d00 * (1 - wx) * (1 - wy)
        + d01 * wx * (1 - wy)
        + d10 * (1 - wx) * wy
        + d11 * wx * wy
    )
    # a neighbor with zero bilinear weight does not poison the result
    # (NaN * 0 = NaN in grid_sample, but weights are never exactly 0 for
    # generic points; treat weight==0 as non-contributing like the corner
    # cases of grid_sample's exact-integer coordinates)
    poisoned = (
        (p00 & ((1 - wx) * (1 - wy) > 0))
        | (p01 & (wx * (1 - wy) > 0))
        | (p10 & ((1 - wx) * wy > 0))
        | (p11 & (wx * wy > 0))
    )
    d_near, v_near = sample_depth_nearest(pts, depth)
    d = jnp.where(poisoned, d_near, bilin)
    valid = jnp.where(poisoned, v_near, bilin > 0)
    return jnp.where(valid, d, 0.0), valid


def sample_depth_nearest(pts: jnp.ndarray, depth: jnp.ndarray):
    B, H, W = depth.shape
    x = jnp.clip(jnp.round(pts[..., 0] - 0.5).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(pts[..., 1] - 0.5).astype(jnp.int32), 0, H - 1)
    inb = (
        (pts[..., 0] >= 0) & (pts[..., 0] < W) & (pts[..., 1] >= 0) & (pts[..., 1] < H)
    )
    d = jnp.take_along_axis(depth.reshape(B, H * W), y * W + x, axis=-1)
    valid = inb & jnp.isfinite(d) & (d > 0)
    return jnp.where(valid, d, 0.0), valid


def sample_depth(pts: jnp.ndarray, depth: jnp.ndarray, interpolation: str = "bilinear"):
    if interpolation == "nearest":
        return sample_depth_nearest(pts, depth)
    return sample_depth_bilinear(pts, depth)


def project(
    kpi: jnp.ndarray,
    di: jnp.ndarray,
    depthj: jnp.ndarray | None,
    camera_i: Camera,
    camera_j: Camera,
    T_itoj: Pose,
    valid: jnp.ndarray,
    ccth: float | None = None,
):
    """Project keypoints of view i (with sampled depths di) into view j.

    Returns (kpi_j pixel coords (B, N, 2), validity (B, N)). With `ccth`
    the reference's cycle-consistency check applies (`depth.py:37-68`):
    sample depth at the projected point, backproject it, transform it back
    to view i, re-project, and require the squared pixel round-trip error
    to be below ccth.
    """
    kpi_3d_i = camera_i.image2cam(kpi) * di[..., None]
    kpi_3d_j = T_itoj.transform(kpi_3d_i)
    kpi_j, visible = camera_j.cam2image(kpi_3d_j)
    validj = valid & visible
    if ccth is None:
        return kpi_j, validj
    dj, valid_dj = sample_depth(kpi_j, depthj)
    kpi_j_3d_j = camera_j.image2cam(kpi_j) * dj[..., None]
    kpi_j_i, valid_cycle = camera_i.cam2image(T_itoj.inv().transform(kpi_j_3d_j))
    consistent = ((kpi - kpi_j_i) ** 2).sum(-1) < ccth
    return kpi_j, validj & valid_dj & valid_cycle & consistent


def dense_warp_consistency(
    depthi: jnp.ndarray,
    depthj: jnp.ndarray,
    T_itoj: Pose,
    camerai: Camera,
    cameraj: Camera,
    **kwargs,
):
    """Warp every pixel of view i into view j using dense depth (reference
    `depth.py:71-88`). Returns (warped pixel grid (B, H, W, 2), valid)."""
    from .utils import image_grid

    B, H, W = depthi.shape
    kpi = jnp.broadcast_to(image_grid(H, W).reshape(1, H * W, 2), (B, H * W, 2))
    di = depthi.reshape(B, H * W)
    valid = jnp.isfinite(di) & (di > 0)
    kpir, validr = project(kpi, di, depthj, camerai, cameraj, T_itoj, valid, **kwargs)
    return kpir.reshape(B, H, W, 2), validr.reshape(B, H, W)


def symmetric_reprojection_error(
    kpts0, kpts1, camera0: Camera, camera1: Camera, T_0to1: Pose, depth0, depth1
):
    """Symmetric pixel reprojection error of aligned correspondences with
    validity mask (reference `depth.py:91-116`). Returns (error (B, N), valid)."""
    d0, valid0 = sample_depth(kpts0, depth0)
    d1, valid1 = sample_depth(kpts1, depth1)
    kpts0_1, _ = project(kpts0, d0, depth1, camera0, camera1, T_0to1, valid0)
    kpts1_0, _ = project(kpts1, d1, depth0, camera1, camera0, T_0to1.inv(), valid1)
    err = 0.5 * (
        jnp.linalg.norm(kpts0_1 - kpts1, axis=-1)
        + jnp.linalg.norm(kpts1_0 - kpts0, axis=-1)
    )
    # reference depth.py:114: validity is DEPTH validity only — projection
    # visibility (in-image bounds) does not gate the error
    valid = valid0 & valid1
    return err, valid
