"""On-device synthetic homography-pair generation (the BASELINE.json
"on-device warp augmentation" goal).

The host pipeline (data/homographies.py) samples homographies and warps with
cv2 in data workers. This module does the same INSIDE the jitted train step:
the loader only streams source images; corner sampling, DLT, perspective
warping, and photometric jitter all run on the TPU — the host data path
reduces to image decoding.

Sampler design (jit-safe; no rejection loops): target-patch corners are
perturbed by bounded uniform offsets (<= difficulty/2 of the patch extent per
corner, which keeps the quadrilateral convex by construction), then randomly
translated inside the source frame; the homography comes from the batched
4-point DLT. This matches the reference sampler's difficulty semantics
(`geometry/homography.py:40-107`) with compiler-friendly control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.homography import compute_homography_dlt
from ..ops.warp import photometric_jitter, warp_perspective, warp_perspective_tiled


def sample_corner_quads(
    rng, batch: int, source_size, difficulty: float = 0.5,
    translation: float = 1.0, dtype=jnp.float32,
):
    """Sample (B, 4, 2) convex source quadrilaterals plus the translated
    inner rectangle (B, 4, 2) they were perturbed from (the λ=0 fallback of
    the window-safety clamp below)."""
    sw, sh = float(source_size[0]), float(source_size[1])
    k_pert, k_trans = jax.random.split(rng)

    # base source quadrilateral: centered patch of fractional size (1 - difficulty/2)
    margin_x = sw * difficulty / 2.0
    margin_y = sh * difficulty / 2.0
    base = jnp.asarray(
        [[0.0, 0.0], [sw, 0.0], [sw, sh], [0.0, sh]], dtype
    )  # source frame corners
    inner = jnp.asarray(
        [
            [margin_x, margin_y],
            [sw - margin_x, margin_y],
            [sw - margin_x, sh - margin_y],
            [margin_x, sh - margin_y],
        ],
        dtype,
    )
    # each inner corner moves toward its frame corner by u in [0, 1):
    # offsets stay within the per-corner quadrant => always convex
    u = jax.random.uniform(k_pert, (batch, 4, 2), dtype=dtype)
    quad = inner[None] + u * (base - inner)[None]

    # random global translation, keeping the quad inside the frame
    left = quad[:, :, 0].min(axis=1)
    right = sw - quad[:, :, 0].max(axis=1)
    top = quad[:, :, 1].min(axis=1)
    bottom = sh - quad[:, :, 1].max(axis=1)
    t = jax.random.uniform(k_trans, (batch, 2), dtype=dtype, minval=-1.0, maxval=1.0)
    tx = translation * jnp.where(t[:, 0] < 0, t[:, 0] * left, t[:, 0] * right)
    ty = translation * jnp.where(t[:, 1] < 0, t[:, 1] * top, t[:, 1] * bottom)
    shift = jnp.stack([tx, ty], axis=-1)[:, None, :]
    return quad + shift, inner[None] + shift


def _patch_corners(batch: int, patch_size, dtype=jnp.float32):
    pw, ph = float(patch_size[0]), float(patch_size[1])
    corners = jnp.asarray([[0.0, 0.0], [pw, 0.0], [pw, ph], [0.0, ph]], dtype)
    return jnp.tile(corners[None], (batch, 1, 1))


def sample_corner_homographies(
    rng, batch: int, source_size, patch_size, difficulty: float = 0.5,
    translation: float = 1.0, dtype=jnp.float32,
):
    """Sample (B, 3, 3) homographies mapping SOURCE pixel coords to PATCH
    pixel coords (cv2.warpPerspective convention used by `warp_perspective`)."""
    quad, _ = sample_corner_quads(
        rng, batch, source_size, difficulty, translation, dtype
    )
    return compute_homography_dlt(quad, _patch_corners(batch, patch_size, dtype))


def _max_tile_footprint(H, patch_size, tile=(16, 128)):
    """Per-batch max source-footprint bbox (h, w) over all output tiles.

    Exact: a projective map keeps tile edges straight, so each tile's
    footprint is the quad of its 4 projected corners and the bbox is
    corner-determined (same reasoning as `warp_perspective_tiled`).
    """
    pw, ph = int(patch_size[0]), int(patch_size[1])
    th, tw = tile
    ny = -(-ph // th)
    nx = -(-pw // tw)
    xs = jnp.arange(nx + 1, dtype=jnp.float32) * tw
    ys = jnp.arange(ny + 1, dtype=jnp.float32) * th
    gx = jnp.tile(xs[None, :], (ny + 1, 1))
    gy = jnp.tile(ys[:, None], (1, nx + 1))
    p = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones((ny + 1) * (nx + 1))], axis=0)
    Hinv = jnp.linalg.inv(H)
    q = Hinv @ p[None]  # (B, 3, P)
    u = (q[:, 0] / (q[:, 2] + 1e-12)).reshape(-1, ny + 1, nx + 1)
    v = (q[:, 1] / (q[:, 2] + 1e-12)).reshape(-1, ny + 1, nx + 1)

    def tile_extent(a):
        # 2x2 adjacent corner stencil per tile
        c = jnp.stack(
            [a[:, :-1, :-1], a[:, :-1, 1:], a[:, 1:, :-1], a[:, 1:, 1:]], axis=-1
        )
        return (c.max(-1) - c.min(-1)).max(axis=(1, 2))  # (B,)

    return tile_extent(v), tile_extent(u)  # (fh, fw)


def _sample_window_safe_homography(
    rng, batch: int, source_size, patch_size, difficulty, translation, window,
    tile=(16, 128), margin: float = 3.0,
):
    """Sample homographies whose every output-tile source footprint PROVABLY
    fits the static `window` of `warp_perspective_tiled` (out-of-window
    pixels would otherwise silently read as zero, corrupting training
    imagery at high difficulty).

    Per batch element, the sampled quad is blended toward its translated
    inner rectangle (quad_λ = inner + λ(quad − inner)) and the largest
    λ ∈ {1, .75, .5, .25, 0} whose footprint fits is kept. λ=0 is an
    axis-aligned scaling with footprint tile*(1−difficulty)*scale < window,
    so a safe choice always exists; the clamp only engages on the rare
    extreme-perspective draws.
    """
    quad, inner = sample_corner_quads(
        rng, batch, source_size, difficulty, translation, jnp.float32
    )
    corners = _patch_corners(batch, patch_size, jnp.float32)
    wh, ww = float(window[0]), float(window[1])
    H_best = None
    fits_prev = None
    for lam in (1.0, 0.75, 0.5, 0.25, 0.0):
        q = inner + lam * (quad - inner)
        Hl = compute_homography_dlt(q, corners)
        fh, fw = _max_tile_footprint(Hl, patch_size, tile)
        fits = (fh <= wh - margin) & (fw <= ww - margin)
        if H_best is None:
            H_best, fits_prev = Hl, fits
        else:
            take = fits & ~fits_prev
            H_best = jnp.where(take[:, None, None], Hl, H_best)
            fits_prev = fits_prev | fits
    return H_best


def generate_homography_pairs(
    source_images: jnp.ndarray,
    rng,
    patch_size=(640, 480),
    difficulty: float = 0.5,
    translation: float = 1.0,
    photometric_strength: float = 0.5,
    warp_impl: str = "tiled",
):
    """source_images (B, H, W, C) -> a two-view train batch with exact
    `H_0to1`, all on device.

    `warp_impl`: "tiled" (default; MXU matmul formulation — the fast TPU
    path) or "gather" (per-pixel gathers; exact everywhere, slow on TPU)."""
    B = source_images.shape[0]
    sh, sw = source_images.shape[1:3]
    k0, k1, kp0, kp1 = jax.random.split(rng, 4)
    if warp_impl == "tiled":
        # window sized for the common case: the source footprint of a
        # (16, 128) output tile is bounded by the patch->source scale
        # (quad <= source frame) plus rotation/perspective spread
        sx = max(1.0, sw / float(patch_size[0]))
        sy = max(1.0, sh / float(patch_size[1]))
        win = (
            min(
                int(np.ceil((16 * sy + 128 * sx * 0.6) / 8 + 1) * 8),
                int(np.ceil(sh / 8) * 8),
            ),
            min(
                int(np.ceil((128 * sx + 16 * sy * 0.6) / 128 + 1) * 128),
                int(np.ceil(sw / 128) * 128),
            ),
        )
        H0 = _sample_window_safe_homography(
            k0, B, (sw, sh), patch_size, difficulty, translation, win
        )
        H1 = _sample_window_safe_homography(
            k1, B, (sw, sh), patch_size, difficulty, translation, win
        )
        warp = lambda im, H: warp_perspective_tiled(im, H, patch_size, window=win)
    else:
        H0 = sample_corner_homographies(
            k0, B, (sw, sh), patch_size, difficulty, translation,
            dtype=jnp.float32,
        )
        H1 = sample_corner_homographies(
            k1, B, (sw, sh), patch_size, difficulty, translation,
            dtype=jnp.float32,
        )
        warp = lambda im, H: warp_perspective(im, H, patch_size)
    img0 = warp(source_images, H0)
    img1 = warp(source_images, H1)
    if photometric_strength > 0:
        img0 = photometric_jitter(img0, kp0, photometric_strength)
        img1 = photometric_jitter(img1, kp1, photometric_strength)
    size = jnp.tile(
        jnp.asarray([[float(patch_size[0]), float(patch_size[1])]], jnp.float32),
        (B, 1),
    )
    H_0to1 = H1 @ jnp.linalg.inv(H0)
    return {
        "view0": {"image": img0.astype(source_images.dtype), "image_size": size},
        "view1": {"image": img1.astype(source_images.dtype), "image_size": size},
        "H_0to1": H_0to1,
    }
