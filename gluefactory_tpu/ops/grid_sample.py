"""Bilinear sampling of dense feature maps at keypoint locations.

Role of the descriptor-sampling path in reference
`gluefactory_nonfree/superpoint.py:117-149` (the "fixed" non-legacy variant:
align_corners=False bilinear sampling of the descriptor map at keypoint
pixel coordinates, followed by L2 normalization).

Pure gather-based jnp: XLA lowers this to efficient dynamic-gathers; a Pallas
variant is unnecessary since the op is bandwidth-trivial next to the conv
backbone.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_nd(fmap: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Sample fmap (B, H, W, C) at continuous pixel points (B, N, 2) [x, y]
    given in the feature map's own pixel scale, COLMAP convention (pixel
    centers at +0.5). Zero padding outside. Returns (B, N, C)."""
    B, H, W, C = fmap.shape
    x = points[..., 0] - 0.5
    y = points[..., 1] - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def gather(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        xx = jnp.clip(xx, 0, W - 1)
        yy = jnp.clip(yy, 0, H - 1)
        idx = yy * W + xx  # (B, N)
        flat = fmap.reshape(B, H * W, C)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    # the blend accumulates in f32 (weights derive from f32 coordinates);
    # return the map's dtype so samplers embedded in bf16 trunks (ALIKED's
    # deformable convs, RoMa refiners, descriptor sampling) don't silently
    # upcast everything downstream (ROADMAP round-4 perf log)
    return out.astype(fmap.dtype)


def sample_descriptors(
    kpts: jnp.ndarray, desc_map: jnp.ndarray, stride: int, normalize: bool = True,
    legacy_offset: bool = True,
) -> jnp.ndarray:
    """Sample a dense descriptor map (B, Hc, Wc, C) at full-resolution keypoint
    coords (B, N, 2): divide coords by `stride`, bilinear sample, L2-normalize.

    With `legacy_offset` (default), reproduces the reference's
    `sample_descriptors_fix_sampling` (`gluefactory_nonfree/superpoint.py:330-340`)
    exactly: a COLMAP-convention keypoint u samples descriptor array index
    (u - 0.5)/s - 0.5 (the reference passes pre-COLMAP integer coords through
    align_corners=False grid_sample). Without it, the geometrically exact
    center mapping u/s - 0.5 is used.
    """
    if legacy_offset:
        pts = (kpts - 0.5) / float(stride)
    else:
        pts = kpts / float(stride)
    desc = grid_sample_nd(desc_map, pts)
    if normalize:
        # norm in f32 (a bf16 sum of 256 squares loses ~1% of scale), then
        # back to the map's dtype so a bf16 pipeline stays bf16 downstream
        norm = jnp.linalg.norm(desc.astype(jnp.float32), axis=-1, keepdims=True)
        desc = desc / (norm + 1e-8).astype(desc.dtype)
    return desc.astype(desc_map.dtype)
