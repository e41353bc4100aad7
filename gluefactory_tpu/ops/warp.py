"""On-device perspective warping (the BASELINE.json "on-device warp
augmentation" goal: replaces `cv2.warpPerspective` in the synthetic
homography data path, reference `datasets/homographies.py:41`).

Inverse-mapping bilinear warp in pure jnp — the homography-pair generator can
then run entirely inside the jitted train step: the host only streams source
images; crops, warps, and photometric jitter happen on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_nd


def warp_perspective(
    image: jnp.ndarray, H: jnp.ndarray, out_size: tuple[int, int]
) -> jnp.ndarray:
    """Warp (B, Hin, Win, C) images by homographies H (B, 3, 3) mapping
    SOURCE -> TARGET pixel coords (cv2.warpPerspective convention): the output
    pixel p_t samples the source at H^-1 p_t. out_size = (width, height)."""
    B = image.shape[0]
    W, Hh = int(out_size[0]), int(out_size[1])
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(Hh, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
    grid = jnp.stack([xx.ravel(), yy.ravel(), jnp.ones(W * Hh)], axis=0)  # (3, P)
    Hinv = jnp.linalg.inv(H)
    src = jnp.einsum("bij,jp->bip", Hinv, grid)
    src = src[:, :2] / (src[:, 2:3] + 1e-12)  # (B, 2, P)
    pts = src.transpose(0, 2, 1)  # (B, P, 2) in source pixel coords
    out = grid_sample_nd(image, pts)
    return out.reshape(B, Hh, W, image.shape[-1])


def warp_perspective_tiled(
    image: jnp.ndarray,
    H: jnp.ndarray,
    out_size: tuple[int, int],
    tile: tuple[int, int] = (16, 128),
    window: tuple[int, int] = (64, 256),
) -> jnp.ndarray:
    """MXU-friendly perspective warp: identical semantics to
    `warp_perspective` but NO per-pixel gathers (TPU vector gathers made the
    gather formulation ~7x slower than host cv2 at B=32 640x480; see
    ROADMAP.md round-1 log).

    Bilinear interpolation factorizes per output tile as
        out[p] = sum_sy A[p,sy] * (sum_sx B[p,sx] * win[sy,sx])
    with A/B = relu(1 - |coord - iota|) hat-function weight matrices — i.e.
    one small matmul pair per tile, which XLA maps onto the MXU.

    Per (th, tw) output tile, the source footprint is the quadrilateral of the
    tile's corners under H^-1 (projective maps keep edges straight); a static
    (sh, sw) `window` is dynamic-sliced around its bbox. EXACT equality with
    `warp_perspective` wherever the footprint (+1px bilinear margin) fits in
    the window; pixels whose footprint exceeds it read as zero-padding. Size
    `window` ~ tile * max local scale (source px per output px) + margin;
    the default fits the homography-augmentation recipes (patch <= source).
    """
    B, Hin, Win, C = image.shape
    W, Hh = int(out_size[0]), int(out_size[1])
    th, tw = tile
    sh, sw = window
    ny = -(-Hh // th)
    nx = -(-W // tw)

    # pad the source so a (sh, sw) slice always fits; padded zeros reproduce
    # zero-padding bilinear semantics at the original image border
    pad_h = max(0, sh - Hin)
    pad_w = max(0, sw - Win)
    img_p = jnp.pad(image, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hs_, Ws_ = Hin + pad_h, Win + pad_w

    Hinv = jnp.linalg.inv(H)  # (B, 3, 3), target->source

    iy = jnp.arange(th, dtype=jnp.float32)
    ix = jnp.arange(tw, dtype=jnp.float32)
    iota_h = jnp.arange(sh, dtype=jnp.float32)
    iota_w = jnp.arange(sw, dtype=jnp.float32)
    tys = (jnp.arange(ny * nx, dtype=jnp.int32) // nx) * th
    txs = (jnp.arange(ny * nx, dtype=jnp.int32) % nx) * tw

    def project(Hi, xs, ys):
        # pixel coords (x, y) -> source ARRAY coords (u, v) (center -0.5)
        p = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0)  # (3, N)
        q = Hi @ p
        return q[0] / (q[2] + 1e-12) - 0.5, q[1] / (q[2] + 1e-12) - 0.5

    def tile_fn(img, Hi, y0, x0):
        # output pixel centers of this tile
        xs = x0.astype(jnp.float32) + ix + 0.5  # (tw,)
        ys = y0.astype(jnp.float32) + iy + 0.5  # (th,)
        xx = jnp.tile(xs[None, :], (th, 1)).ravel()
        yy = jnp.tile(ys[:, None], (1, tw)).ravel()
        u, v = project(Hi, xx, yy)  # (P,) source array coords

        # window placement from the tile-corner footprint bbox
        cx = jnp.asarray(
            [x0, x0 + tw, x0, x0 + tw], jnp.float32
        )
        cy = jnp.asarray(
            [y0, y0, y0 + th, y0 + th], jnp.float32
        )
        cu, cv = project(Hi, cx, cy)
        u0 = jnp.clip(
            jnp.floor(cu.min() - 1.0).astype(jnp.int32), 0, Ws_ - sw
        )
        v0 = jnp.clip(
            jnp.floor(cv.min() - 1.0).astype(jnp.int32), 0, Hs_ - sh
        )
        win = jax.lax.dynamic_slice(img, (v0, u0, 0), (sh, sw, C))

        lu = u - u0.astype(jnp.float32)  # (P,)
        lv = v - v0.astype(jnp.float32)
        # hat-function weights: zero outside the +-1 bilinear footprint
        Bm = jnp.maximum(1.0 - jnp.abs(lu[:, None] - iota_w[None, :]), 0.0)
        Am = jnp.maximum(1.0 - jnp.abs(lv[:, None] - iota_h[None, :]), 0.0)
        dt = img.dtype
        T = jnp.einsum(
            "pw,hwc->phc", Bm.astype(dt), win, preferred_element_type=jnp.float32
        )
        out = jnp.einsum(
            "ph,phc->pc", Am.astype(dt), T.astype(dt),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(th, tw, C).astype(dt)

    per_image = jax.vmap(tile_fn, in_axes=(None, None, 0, 0))  # over tiles
    tiles = jax.vmap(per_image, in_axes=(0, 0, None, None))(img_p, Hinv, tys, txs)
    out = tiles.reshape(B, ny, nx, th, tw, C).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, ny * th, nx * tw, C)
    return out[:, :Hh, :W]


def photometric_jitter(image: jnp.ndarray, rng, strength: float = 0.5) -> jnp.ndarray:
    """Stateless on-device photometric augmentation: brightness/contrast/
    gamma/noise (the device-side counterpart of `data/augmentations.py`)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    B = image.shape[0]
    brightness = 1.0 + strength * jax.random.uniform(k1, (B, 1, 1, 1), minval=-0.3, maxval=0.3)
    contrast = 1.0 + strength * jax.random.uniform(k2, (B, 1, 1, 1), minval=-0.3, maxval=0.3)
    gamma = 1.0 + strength * jax.random.uniform(k3, (B, 1, 1, 1), minval=-0.4, maxval=0.6)
    mean = image.mean(axis=(1, 2, 3), keepdims=True)
    out = (image - mean) * contrast + mean * brightness
    out = jnp.clip(out, 0.0, 1.0) ** gamma
    noise = strength * 0.02 * jax.random.normal(k4, image.shape)
    return jnp.clip(out + noise, 0.0, 1.0)
