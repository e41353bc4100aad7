"""Keypoint detection ops: NMS, top-k selection, sub-pixel refinement.

Role of reference `gluefactory_nonfree/superpoint.py:60-113` (simple_nms,
top-k, soft-argmax). TPU-first design: everything is static-shape — keypoint
selection always returns exactly K keypoints with a validity mask, never a
ragged list (SURVEY §5.7: padded+masked is the house style).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_2d(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Max pool with kernel (2r+1) stride 1, same padding. x: (B, H, W).

    (Measured on v5e: a separable two-pass 1-D formulation is NOT faster —
    reduce_window here is pass/bandwidth-bound, not tap-bound.)"""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, k),
        window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius)),
    )


def simple_nms(scores: jnp.ndarray, radius: int, iters: int = 2) -> jnp.ndarray:
    """Fast iterated NMS (behavioral spec: reference `superpoint.py:60-80`).

    Keeps scores that are local maxima in a (2r+1)^2 window; iteratively
    suppresses neighbors of kept maxima so near-equal neighbors survive.
    scores: (B, H, W) -> same shape with suppressed entries zeroed.
    """
    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool_2d(scores, radius)
    for _ in range(iters):
        supp_mask = max_pool_2d(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool_2d(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def remove_borders(scores: jnp.ndarray, border: int) -> jnp.ndarray:
    """Zero out a border margin (reference `superpoint.py:243-254`)."""
    if border <= 0:
        return scores
    B, H, W = scores.shape
    mask = jnp.zeros((H, W), dtype=bool).at[border : H - border, border : W - border].set(True)
    return jnp.where(mask[None], scores, jnp.zeros_like(scores))


def top_k_keypoints(scores: jnp.ndarray, k: int, threshold: float = 0.0,
                    nms_radius: int | None = None):
    """Select the top-k scoring pixels as keypoints (static shape).

    scores: (B, H, W). Returns (keypoints (B, k, 2) xy in COLMAP convention
    (+0.5 pixel-center offset), kp_scores (B, k), valid (B, k)).
    Entries below `threshold` (or beyond the number of nonzero scores) are
    marked invalid; their coordinates are clamped in-image so downstream
    gathers stay safe.

    With `nms_radius` given (scores already NMS'd with that radius), a
    two-stage EXACT top-k runs: NMS survivors are > radius apart, so a
    t x t tile with t <= radius + 1 holds at most one positive survivor —
    per-tile max reduction shrinks the sort input by t^2 before `lax.top_k`
    (the flat 1M-element sort dominates detection decode cost on TPU).
    """
    B, H, W = scores.shape
    tile = 0
    if nms_radius is not None and nms_radius >= 1:
        tile = min(nms_radius + 1, 4)
        while tile > 1 and (H % tile or W % tile):
            tile -= 1
    if tile >= 2 and scores.dtype == jnp.bfloat16:
        # Fast path for bf16 score maps (the TPU inference dtype): pack the
        # bf16 bit pattern (order-preserving for the non-negative NMS'd
        # scores) with the tile-local position into a uint32 key, tile-reduce
        # with a strided reduce_window, and run one exact top-k over packed
        # keys. Measured v5e, 8x1024^2: the reshape-based tile max below
        # costs 2.5 ms alone; the packed reduce_window path removes it.
        # Tie-breaking among exactly-equal scores differs (higher local
        # index wins), which only permutes equal-score detections.
        bits = jax.lax.bitcast_convert_type(scores, jnp.uint16).astype(jnp.uint32)
        ly = (jnp.arange(H, dtype=jnp.uint32) % tile)[:, None]
        lx = (jnp.arange(W, dtype=jnp.uint32) % tile)[None, :]
        local = ly * tile + lx  # < 16, fits the low 16 bits
        key = (bits << 16) | local[None]
        tile_key = jax.lax.reduce_window(
            key,
            jnp.uint32(0),
            jax.lax.max,
            window_dimensions=(1, tile, tile),
            window_strides=(1, tile, tile),
            padding="VALID",
        )
        Ht, Wt = H // tile, W // tile
        topk, tidx = jax.lax.top_k(tile_key.reshape(B, Ht * Wt), k)
        vals = jax.lax.bitcast_convert_type(
            (topk >> 16).astype(jnp.uint16), jnp.bfloat16
        )
        inner = topk & jnp.uint32(0xFFFF)
        ty = (tidx // Wt).astype(jnp.float32)
        tx = (tidx % Wt).astype(jnp.float32)
        iy = (inner // tile).astype(jnp.float32)
        ix = (inner % tile).astype(jnp.float32)
        xs = tx * tile + ix
        ys = ty * tile + iy
        kpts = jnp.stack([xs, ys], axis=-1) + 0.5
        valid = vals > jnp.asarray(threshold, vals.dtype)
        return kpts, vals, valid
    if tile >= 2:
        Ht, Wt = H // tile, W // tile
        t2 = tile * tile
        blocks = scores.reshape(B, Ht, tile, Wt, tile).transpose(0, 1, 3, 2, 4)
        blocks = blocks.reshape(B, Ht * Wt, t2)
        tile_max = blocks.max(axis=-1)
        tile_arg = blocks.argmax(axis=-1)  # position inside the tile
        vals, tidx = jax.lax.top_k(tile_max, k)  # (B, k) over Ht*Wt tiles
        inner = jnp.take_along_axis(tile_arg, tidx, axis=-1)
        ty = (tidx // Wt).astype(jnp.float32)
        tx = (tidx % Wt).astype(jnp.float32)
        iy = (inner // tile).astype(jnp.float32)
        ix = (inner % tile).astype(jnp.float32)
        xs = tx * tile + ix
        ys = ty * tile + iy
    else:
        flat = scores.reshape(B, H * W)
        vals, idx = jax.lax.top_k(flat, k)
        ys = (idx // W).astype(jnp.float32)
        xs = (idx % W).astype(jnp.float32)
    kpts = jnp.stack([xs, ys], axis=-1) + 0.5  # COLMAP pixel-center convention
    valid = vals > threshold
    return kpts, vals, valid


def soft_argmax_refinement(kpts: jnp.ndarray, scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sub-pixel refinement: score-weighted mean position in a window around
    each keypoint (reference `superpoint.py:97-113`).

    kpts: (B, K, 2) pixel-center coords; scores: (B, H, W) dense score map.
    """
    B, H, W = scores.shape
    d = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    offsets = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (d*d, 2)
    centers = kpts - 0.5  # back to array indices
    pos = centers[:, :, None, :] + offsets[None, None]  # (B, K, d*d, 2)
    xi = jnp.clip(jnp.round(pos[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pos[..., 1]).astype(jnp.int32), 0, H - 1)
    inb = (
        (pos[..., 0] >= 0) & (pos[..., 0] <= W - 1)
        & (pos[..., 1] >= 0) & (pos[..., 1] <= H - 1)
    )
    flat = scores.reshape(B, H * W)
    s = jnp.take_along_axis(flat[:, None, :], (yi * W + xi).reshape(B, -1)[:, None, :], axis=-1)
    s = s.reshape(B, kpts.shape[1], d * d) * inb
    wsum = s.sum(axis=-1, keepdims=True) + 1e-8
    refined = (pos * s[..., None]).sum(axis=-2) / wsum
    return refined + 0.5


def sample_padding_keypoints(rng, n: int, batch: int, image_size) -> jnp.ndarray:
    """Uniform random in-image keypoints used to pad to a fixed count
    (reference `models/utils/misc.py:60-70` pad_and_stack with random kpts)."""
    size = jnp.asarray(image_size, dtype=jnp.float32)  # (B, 2) [w, h]
    u = jax.random.uniform(rng, (batch, n, 2))
    return u * size[:, None, :]
