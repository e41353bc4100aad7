"""Homography sampling, estimation, warping and errors.

Role of reference `geometry/homography.py`. Split by execution site:
  - host (numpy): random homography sampling for the synthetic data pipeline
    (`sample_homography_corners`) — runs in data workers.
  - device (jnp): point/line warps, DLT solve, symmetric/corner errors — used
    in GT generation, losses, and eval metrics; all batched and jit-safe.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .utils import from_homogeneous, to_homogeneous

# ---------------------------------------------------------------------------
# Host-side random homography sampling (data pipeline)
# ---------------------------------------------------------------------------


def flat2mat(H8):
    """(..., 8) -> (..., 3, 3) with H[2,2] = 1."""
    H8 = np.asarray(H8)
    return np.concatenate([H8, np.ones_like(H8[..., :1])], axis=-1).reshape(
        H8.shape[:-1] + (3, 3)
    )


def create_center_patch(shape, patch_shape=None):
    if patch_shape is None:
        patch_shape = shape
    width, height = shape
    pwidth, pheight = patch_shape
    left = int((width - pwidth) / 2)
    bottom = int((height - pheight) / 2)
    right = int((width + pwidth) / 2)
    top = int((height + pheight) / 2)
    return np.array([[left, bottom], [left, top], [right, top], [right, bottom]])


def check_convex(patch, min_convexity=0.05):
    """Is the polygon (N, 2) convex with clockwise winding?

    Vectorized: the z cross-product of every incoming edge with its outgoing
    edge must stay at or below ``-min_convexity`` (reference
    `geometry/homography.py:29-37` semantics).
    """
    p = np.asarray(patch, dtype=np.float64)
    out_edge = np.roll(p, -1, axis=0) - p  # edge leaving vertex i
    in_edge = np.roll(out_edge, 1, axis=0)  # edge arriving at vertex i
    cross = in_edge[:, 0] * out_edge[:, 1] - out_edge[:, 0] * in_edge[:, 1]
    return bool(np.all(cross <= -min_convexity))


def _rotate_about(points, center, angle):
    """Rotate (N, 2) points about `center` — row-vector convention
    p' = (p - c) @ [[cos, -sin], [sin, cos]] + c, matching the reference's
    matmul orientation (`geometry/homography.py:77-90`)."""
    c, s = math.cos(angle), math.sin(angle)
    d = points - center
    return np.stack([d[:, 0] * c + d[:, 1] * s, d[:, 1] * c - d[:, 0] * s], 1) + center


def sample_homography_corners(
    shape,
    patch_shape,
    difficulty=1.0,
    translation=0.4,
    n_angles=10,
    max_angle=90,
    min_convexity=0.05,
    rng=np.random,
):
    """Sample a random homography mapping a convex quadrilateral of the
    source frame `shape` (w, h) onto the `patch_shape` patch.

    Reference-exact re-derivation of `geometry/homography.py:40-107`,
    including RNG call order, so that feeding both sides the same
    ``np.random.RandomState`` yields identical output
    (tests/test_torchref_geometry.py). Stages:
      1. perturb the frame corners inward (up to the `difficulty`-shrunk
         center patch), rejection-sampled until convex;
      2. re-center the quad onto the shrunk patch's centroid;
      3. rotate about the centroid by the first of ``n_angles - 1`` shuffled
         candidate angles (range scaled by `difficulty`) that keeps the quad
         fully inside the frame — unrotated if none fits;
      4. translate by a uniform in-bounds offset scaled by
         ``translation * difficulty``.

    Returns ``(H, frame_corners, warped_frame_corners, patch_shape)``; H maps
    source pixel coords to patch pixel coords.
    """
    width, height = shape
    norm = np.array(shape, dtype=np.float64)
    frame = create_center_patch(shape)
    target = create_center_patch(patch_shape)
    # the difficulty-shrunk center patch bounds the per-corner perturbation
    inner = create_center_patch(
        shape, (width * (1 - difficulty), height * (1 - difficulty))
    )
    spread = inner - frame  # inward extent available to each corner

    quad = inner.astype(np.float64)
    while True:
        cand = frame + rng.uniform(0.0, 1.0, size=(4, 2)) * spread
        if check_convex(cand / norm, min_convexity):
            quad = cand
            break

    # re-center the quad onto the shrunk patch's centroid
    quad = quad + (inner.mean(0) - quad.mean(0))[None]

    if n_angles > 0 and difficulty > 0:
        limit = math.radians(max_angle) * difficulty
        angles = np.linspace(-limit, limit, n_angles)
        rng.shuffle(angles)
        rng.shuffle(angles)
        centroid = quad.mean(0, keepdims=True)
        # the reference considers only the first n_angles - 1 shuffled
        # candidates (homography.py:92 iterates range(1, n_angles) over the
        # zero-prepended array) and keeps the quad unrotated if none fits
        for angle in angles[: n_angles - 1]:
            cand = _rotate_about(quad, centroid, angle)
            scaled = cand / norm
            if np.all((scaled >= 0.0) & (scaled < 1.0)):
                quad = cand
                break

    if translation > 0:
        lo = -quad.min(0)
        hi = norm - quad.max(0)
        quad = quad + rng.uniform(lo, hi)[None] * (translation * difficulty)

    H = compute_homography_np(quad, target, [1.0, 1.0])
    frame_h = np.concatenate([frame, np.ones((4, 1))], 1) @ H.astype(np.float64).T
    warped = frame_h[:, :2] / frame_h[:, 2:]
    return H, frame.astype(np.float64), warped, patch_shape


def compute_homography_np(pts1, pts2, shape=(1.0, 1.0)) -> np.ndarray:
    """DLT homography from >=4 correspondences (numpy, host side).

    Spec from reference `geometry/homography.py:110-128`: normalize by shape,
    solve the 2N x 9 system by SVD.
    """
    shape = np.asarray(shape, dtype=np.float64)
    pts1 = np.asarray(pts1, dtype=np.float64) / shape[None]
    pts2 = np.asarray(pts2, dtype=np.float64) / shape[None]
    n = pts1.shape[0]
    A = np.zeros((2 * n, 9))
    for i in range(n):
        x, y = pts1[i]
        u, v = pts2[i]
        A[2 * i] = [0, 0, 0, -x, -y, -1, v * x, v * y, v]
        A[2 * i + 1] = [x, y, 1, 0, 0, 0, -u * x, -u * y, -u]
    _, _, Vt = np.linalg.svd(A)
    h = Vt[-1]
    H = h.reshape(3, 3)
    # denormalize
    S = np.diag([1.0 / shape[0], 1.0 / shape[1], 1.0])
    Sinv = np.diag([shape[0], shape[1], 1.0])
    H = Sinv @ H @ S
    return (H / H[2, 2]).astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side (jnp) warps and errors
# ---------------------------------------------------------------------------


def warp_points(points: jnp.ndarray, H: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Warp (..., N, 2) points by homographies (..., 3, 3).

    `inverse=True` warps with H^-1 (points from image-1 back to image-0) —
    same convention as reference `warp_points_torch` (`homography.py:161-180`).
    """
    H = jnp.linalg.inv(H) if inverse else H
    pts_h = to_homogeneous(points)
    warped = jnp.einsum("...ij,...nj->...ni", H, pts_h)
    return from_homogeneous(warped, eps=1e-8)


def warp_lines(lines: jnp.ndarray, H: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Warp (..., L, 2, 2) line segments endpoint-wise."""
    shp = lines.shape
    flat = lines.reshape(shp[:-3] + (shp[-3] * 2, 2))
    warped = warp_points(flat, H, inverse=inverse)
    return warped.reshape(shp)


def sym_homography_error(kpts0, kpts1, T_0to1) -> jnp.ndarray:
    """Symmetric reprojection error of aligned correspondences (..., N)."""
    kpts0_1 = warp_points(kpts0, T_0to1)
    dist0_1 = jnp.linalg.norm(kpts0_1 - kpts1, axis=-1)
    kpts1_0 = warp_points(kpts1, T_0to1, inverse=True)
    dist1_0 = jnp.linalg.norm(kpts1_0 - kpts0, axis=-1)
    return (dist0_1 + dist1_0) / 2.0


def sym_homography_error_all(kpts0, kpts1, H) -> jnp.ndarray:
    """All-pairs symmetric error matrix (..., N0, N1)."""
    kpts0_1 = warp_points(kpts0, H)  # (..., N0, 2)
    kpts1_0 = warp_points(kpts1, H, inverse=True)  # (..., N1, 2)
    dist0 = jnp.linalg.norm(kpts0_1[..., :, None, :] - kpts1[..., None, :, :], axis=-1)
    dist1 = jnp.linalg.norm(kpts0[..., :, None, :] - kpts1_0[..., None, :, :], axis=-1)
    return (dist0 + dist1) / 2.0


def homography_corner_error(T, T_gt, image_size) -> jnp.ndarray:
    """Mean warp discrepancy of the 4 image corners (reference
    `homography.py:336-342`). `image_size` is (..., 2) [w, h]."""
    image_size = jnp.asarray(image_size, dtype=jnp.float32)
    w, h = image_size[..., 0], image_size[..., 1]
    zeros = jnp.zeros_like(w)
    corners = jnp.stack(
        [
            jnp.stack([zeros, zeros], -1),
            jnp.stack([w, zeros], -1),
            jnp.stack([w, h], -1),
            jnp.stack([zeros, h], -1),
        ],
        axis=-2,
    )  # (..., 4, 2)
    corners_t = warp_points(corners, T)
    corners_gt = warp_points(corners, T_gt)
    return jnp.linalg.norm(corners_t - corners_gt, axis=-1).mean(axis=-1)


def compute_homography_dlt(pts0: jnp.ndarray, pts1: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Batched (weighted) DLT homography in jnp: (..., N, 2) x2 -> (..., 3, 3).

    Hartley-normalized; replaces kornia's weighted DLT used by
    `eval/utils.py:241-261`. Weights default to uniform.
    """
    dtype = jnp.promote_types(pts0.dtype, jnp.float32)
    pts0 = pts0.astype(dtype)
    pts1 = pts1.astype(dtype)
    if weights is None:
        weights = jnp.ones(pts0.shape[:-1], dtype=dtype)
    else:
        weights = weights.astype(dtype)

    def normalize(pts, w):
        wsum = w.sum(axis=-1, keepdims=True) + 1e-8
        mean = (pts * w[..., None]).sum(axis=-2, keepdims=True) / wsum[..., None]
        d = jnp.linalg.norm(pts - mean, axis=-1)
        scale = jnp.sqrt(2.0) / ((d * w).sum(axis=-1, keepdims=True) / wsum + 1e-8)
        T = jnp.zeros(pts.shape[:-2] + (3, 3), dtype=dtype)
        T = T.at[..., 0, 0].set(scale[..., 0])
        T = T.at[..., 1, 1].set(scale[..., 0])
        T = T.at[..., 2, 2].set(1.0)
        T = T.at[..., 0, 2].set(-scale[..., 0] * mean[..., 0, 0])
        T = T.at[..., 1, 2].set(-scale[..., 0] * mean[..., 0, 1])
        return (pts - mean) * scale[..., None], T

    p0n, T0 = normalize(pts0, weights)
    p1n, T1 = normalize(pts1, weights)

    x, y = p0n[..., 0], p0n[..., 1]
    u, v = p1n[..., 0], p1n[..., 1]
    o = jnp.ones_like(x)
    z = jnp.zeros_like(x)
    row1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    row2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    A = jnp.concatenate([row1, row2], axis=-2)  # (..., 2N, 9)
    w2 = jnp.concatenate([weights, weights], axis=-1)  # (..., 2N)
    AtA = jnp.einsum("...ni,...n,...nj->...ij", A, w2, A)
    # smallest eigenvector of AtA
    eigvals, eigvecs = jnp.linalg.eigh(AtA)
    h = eigvecs[..., :, 0]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / (H[..., 2:3, 2:3] + 1e-12)
