"""Epipolar geometry: essential/fundamental matrices, distances, pose errors.

Role of reference `geometry/epipolar.py:1-155`. Pure jnp, fully batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils import skew_symmetric, to_homogeneous
from .wrappers import Camera, Pose


def T_to_E(T: Pose) -> jnp.ndarray:
    """Essential matrix from relative pose: E = [t]_x R."""
    return skew_symmetric(T.t) @ T.R


def T_to_F(cam0: Camera, cam1: Camera, T_0to1: Pose) -> jnp.ndarray:
    """Fundamental matrix from calibrated relative pose."""
    E = T_to_E(T_0to1)
    K0_inv = jnp.linalg.inv(cam0.calibration_matrix())
    K1_inv = jnp.linalg.inv(cam1.calibration_matrix())
    return jnp.swapaxes(K1_inv, -1, -2) @ E @ K0_inv


def sym_epipolar_distance(p0, p1, E, squared: bool = True) -> jnp.ndarray:
    """Symmetric epipolar distance of aligned correspondences (..., N).

    Points are in normalized camera coords (matching reference
    `epipolar.py:32-56`).
    """
    p0h = to_homogeneous(p0)
    p1h = to_homogeneous(p1)
    Ep0 = jnp.einsum("...ij,...nj->...ni", E, p0h)
    Etp1 = jnp.einsum("...ji,...nj->...ni", E, p1h)
    p1Ep0 = jnp.einsum("...ni,...ni->...n", p1h, Ep0)
    # reference: SUM of the two per-line reciprocal norms (epipolar.py:50-56),
    # not the reciprocal of the summed norms
    d0 = jnp.maximum(Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2, 1e-6)
    d1 = jnp.maximum(Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2, 1e-6)
    if squared:
        return p1Ep0**2 * (1.0 / d0 + 1.0 / d1)
    return jnp.abs(p1Ep0) * (1.0 / jnp.sqrt(d0) + 1.0 / jnp.sqrt(d1)) / 2.0


def sym_epipolar_distance_all(p0, p1, E, eps: float = 1e-15) -> jnp.ndarray:
    """All-pairs symmetric epipolar distance matrix (..., N0, N1)
    (reference `epipolar.py:59-72`)."""
    p0h = to_homogeneous(p0)  # (..., N0, 3)
    p1h = to_homogeneous(p1)  # (..., N1, 3)
    Ep0 = jnp.einsum("...ij,...nj->...ni", E, p0h)  # (..., N0, 3)
    Etp1 = jnp.einsum("...ji,...nj->...ni", E, p1h)  # (..., N1, 3)
    p1Ep0 = jnp.abs(
        jnp.einsum("...mi,...ni->...nm", p1h, Ep0)
    )  # (..., N0, N1)
    # reference returns the NON-squared mean of the two line distances
    # (epipolar.py:59-72)
    d0 = jnp.sqrt(Ep0[..., :, None, 0] ** 2 + Ep0[..., :, None, 1] ** 2 + eps)
    d1 = jnp.sqrt(
        Etp1[..., None, :, 0] ** 2 + Etp1[..., None, :, 1] ** 2 + eps
    )
    return (p1Ep0 / d0 + p1Ep0 / d1) / 2.0


def E_to_Rt_candidates(E: jnp.ndarray):
    """Decompose an essential matrix into the 4 (R, t) candidates."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce right-handedness
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ jnp.swapaxes(W, -1, -2) @ Vt
    t = U[..., :, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def angle_error_mat(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    cos = (jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-1, axis2=-2) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.rad2deg(jnp.abs(jnp.arccos(cos)))


def angle_error_vec(v1: jnp.ndarray, v2: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    n = jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    cos = jnp.sum(v1 * v2, axis=-1) / (n + eps)
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def relative_pose_error(T_0to1: Pose, R: jnp.ndarray, t: jnp.ndarray, ignore_gt_t_thr: float = 0.0):
    """Angular rotation and translation errors vs GT pose (reference
    `epipolar.py:127-155`). Translation error is direction-only (up to sign).
    """
    R_gt, t_gt = T_0to1.R, T_0to1.t
    t_err = angle_error_vec(t, t_gt)
    t_err = jnp.minimum(t_err, 180.0 - t_err)  # ambiguous sign
    # small GT translation makes direction meaningless
    t_norm = jnp.linalg.norm(t_gt, axis=-1)
    t_err = jnp.where(t_norm < ignore_gt_t_thr, jnp.zeros_like(t_err), t_err)
    r_err = angle_error_mat(R, R_gt)
    # reference return order: (t_err, r_err) — epipolar.py:139-155
    return t_err, r_err
