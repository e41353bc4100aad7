"""Low-level batched geometry helpers (role of reference `geometry/utils.py`).

All functions are pure jnp over arbitrary batch dims and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last dim: (..., N) -> (..., N+1)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def from_homogeneous(points: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Divide by the last coordinate: (..., N+1) -> (..., N)."""
    return points[..., :-1] / (points[..., -1:] + eps)


def skew_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix of (..., 3) vectors -> (..., 3, 3)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            z, -v[..., 2], v[..., 1],
            v[..., 2], z, -v[..., 0],
            -v[..., 1], v[..., 0], z,
        ],
        axis=-1,
    ).reshape(v.shape[:-1] + (3, 3))


def so3exp_map(w: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rodrigues: so(3) vector (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = theta < eps
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    w_hat = skew_symmetric(w / theta_safe)
    w_hat2 = w_hat @ w_hat
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), w_hat.shape)
    R = eye + s * w_hat + (1.0 - c) * w_hat2
    # first-order fallback near zero
    R0 = eye + skew_symmetric(w)
    return jnp.where(small[..., None], R0, R)


def distort_points(pts: jnp.ndarray, dist: jnp.ndarray):
    """Radial (+thin-prism) distortion of normalized 2D points.

    Follows the COLMAP simple/radial model used by the reference
    (`geometry/utils.py` torchscript `distort_points`): supports up to 2 radial
    coefficients. Returns (distorted_points, valid_mask).
    """
    x2 = jnp.square(pts).sum(axis=-1, keepdims=True)
    ncoef = dist.shape[-1]
    radial = jnp.zeros_like(x2[..., 0])
    rn = jnp.ones_like(x2[..., 0])
    for i in range(ncoef):
        rn = rn * x2[..., 0]
        radial = radial + dist[..., i] * rn
    out = pts * (1.0 + radial)[..., None]
    valid = jnp.ones(out.shape[:-1], dtype=bool)
    return out, valid


def undistort_points(pts: jnp.ndarray, dist: jnp.ndarray, iters: int = 5):
    """Iteratively invert `distort_points` (Newton fixed-point, unrolled)."""
    und = pts
    for _ in range(iters):
        dpts, _ = distort_points(und, dist)
        und = und + (pts - dpts)
    return und


def image_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinate grid (h, w, 2) in COLMAP convention: the center
    of the top-left pixel is (0.5, 0.5)."""
    x = jnp.arange(w, dtype=dtype) + 0.5
    y = jnp.arange(h, dtype=dtype) + 0.5
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xx, yy], axis=-1)
