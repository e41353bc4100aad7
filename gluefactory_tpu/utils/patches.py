"""Patch extraction around keypoints + heatmap building (role of reference
`utils/patches.py:4-51`). Pure jnp, batched, static shapes."""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(image: jnp.ndarray, kpts: jnp.ndarray, radius: int):
    """Extract (2r+1)^2 patches around integer keypoint locations.

    image (B, H, W, C), kpts (B, N, 2) -> (patches (B, N, 2r+1, 2r+1, C),
    valid (B, N))."""
    B, H, W, C = image.shape
    d = 2 * radius + 1
    centers = jnp.round(kpts - 0.5).astype(jnp.int32)
    offs = jnp.arange(-radius, radius + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    ys = centers[..., 1][..., None, None] + dy[None, None]
    xs = centers[..., 0][..., None, None] + dx[None, None]
    valid = (
        (centers[..., 0] >= radius)
        & (centers[..., 0] < W - radius)
        & (centers[..., 1] >= radius)
        & (centers[..., 1] < H - radius)
    )
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)
    flat = image.reshape(B, H * W, C)
    idx = (ys * W + xs).reshape(B, -1)
    patches = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return patches.reshape(B, kpts.shape[1], d, d, C), valid


def build_heatmap(shape, kpts: jnp.ndarray, scores: jnp.ndarray | None = None):
    """Scatter keypoint scores into a (B, H, W) heatmap."""
    B, H, W = shape
    x = jnp.clip(jnp.round(kpts[..., 0] - 0.5).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(kpts[..., 1] - 0.5).astype(jnp.int32), 0, H - 1)
    if scores is None:
        scores = jnp.ones(kpts.shape[:2], jnp.float32)
    flat = jnp.zeros((B, H * W), scores.dtype)
    flat = flat.at[jnp.arange(B)[:, None], y * W + x].add(scores)
    return flat.reshape(B, H, W)
