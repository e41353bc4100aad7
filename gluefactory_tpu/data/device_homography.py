"""On-device synthetic homography-pair generation (the BASELINE.json
"on-device warp augmentation" goal).

The host pipeline (data/homographies.py) samples homographies and warps with
cv2 in data workers. This module does the same INSIDE the jitted train step:
the loader only streams source images; corner sampling, DLT, perspective
warping, and photometric jitter all run on the TPU — the host data path
reduces to image decoding.

Sampler design (jit-safe; no data-dependent Python control flow): the host
sampler's rejection loops become fixed-width candidate fans selected by
masks. Stages mirror the reference (`geometry/homography.py:40-107`, and our
reference-exact host sampler in `geometry/homography.py`):
  1. perturb the frame corners inward by uniform offsets bounded by the
     difficulty-shrunk center patch; K candidate draws, first convex one is
     kept (fallback: a size-floored center patch — never degenerate);
  2. re-center the quad onto the patch centroid;
  3. rotate about the centroid by the first of a shuffled fan of
     difficulty-scaled candidate angles that keeps the quad inside the frame
     (unrotated if none fits);
  4. translate by a uniform in-bounds offset scaled by
     translation * difficulty.
The homography comes from the batched 4-point DLT.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.homography import compute_homography_dlt, create_center_patch
from ..ops.warp import photometric_jitter, warp_perspective, warp_perspective_tiled


def _convex_mask(quads: jnp.ndarray, norm, min_convexity: float = 0.05):
    """(..., 4, 2) clockwise-convexity mask, reference semantics
    (all successive-edge cross products <= -min_convexity on the
    shape-normalized polygon)."""
    p = quads / norm
    out_e = jnp.roll(p, -1, axis=-2) - p
    in_e = jnp.roll(out_e, 1, axis=-2)
    cross = in_e[..., 0] * out_e[..., 1] - out_e[..., 0] * in_e[..., 1]
    return jnp.all(cross <= -min_convexity, axis=-1)


def sample_corner_quads(
    rng, batch: int, source_size, difficulty: float = 0.5,
    translation: float = 1.0, dtype=jnp.float32,
    n_angles: int = 10, max_angle: float = 90.0, min_convexity: float = 0.05,
    n_convex_tries: int = 4,
):
    """Sample (B, 4, 2) source quadrilaterals following the reference
    distribution, plus a translated axis-aligned anchor rectangle (B, 4, 2)
    (the λ=0 fallback of the window-safety clamp below; size-floored at 25%
    of the frame so it never degenerates at difficulty -> 1)."""
    sw, sh = float(source_size[0]), float(source_size[1])
    norm = jnp.asarray([sw, sh], dtype)
    k_pert, k_ang, k_trans = jax.random.split(rng, 3)

    frame = jnp.asarray(create_center_patch((source_size[0], source_size[1])), dtype)
    inner = jnp.asarray(
        create_center_patch(
            (source_size[0], source_size[1]),
            (sw * (1.0 - difficulty), sh * (1.0 - difficulty)),
        ),
        dtype,
    )
    spread = inner - frame  # inward extent available to each corner
    # degenerate-proof anchor: `inner` collapses to four identical center
    # points as difficulty -> 1 (a singular DLT system -> NaN H), so the
    # convexity fallback and the window-safety lambda-blend anchor use a
    # size-floored center patch (>= 25% of the frame) instead; `inner`
    # itself still sets the perturbation spread (reference distribution)
    shrink = min(difficulty, 0.75)
    anchor = jnp.asarray(
        create_center_patch(
            (source_size[0], source_size[1]),
            (sw * (1.0 - shrink), sh * (1.0 - shrink)),
        ),
        dtype,
    )

    # stage 1: K candidate perturbations, keep the first convex one
    u = jax.random.uniform(k_pert, (n_convex_tries, batch, 4, 2), dtype=dtype)
    cands = frame[None, None] + u * spread[None, None]  # (K, B, 4, 2)
    ok = _convex_mask(cands, norm, min_convexity)  # (K, B)
    first = jnp.argmax(ok, axis=0)  # (B,)
    any_ok = jnp.any(ok, axis=0)
    picked = jnp.take_along_axis(cands, first[None, :, None, None], axis=0)[0]
    quad = jnp.where(any_ok[:, None, None], picked, anchor[None])

    # stage 2: re-center onto the shrunk patch's centroid
    quad = quad + (inner.mean(0) - quad.mean(1))[:, None, :]

    # stage 3: rotation fan — first in-frame candidate wins, else unrotated
    if n_angles > 1 and difficulty > 0 and max_angle > 0:
        limit = math.radians(max_angle) * difficulty
        base_angles = jnp.linspace(-limit, limit, n_angles, dtype=dtype)
        # per-item shuffle, considering n_angles - 1 candidates like the host
        perm = jax.vmap(
            lambda k: jax.random.permutation(k, base_angles)[: n_angles - 1]
        )(jax.random.split(k_ang, batch))  # (B, A)
        centroid = quad.mean(1, keepdims=True)  # (B, 1, 2)
        d = quad - centroid  # (B, 4, 2)
        c = jnp.cos(perm)[:, :, None]  # (B, A, 1)
        s = jnp.sin(perm)[:, :, None]
        rx = d[:, None, :, 0] * c + d[:, None, :, 1] * s  # (B, A, 4)
        ry = d[:, None, :, 1] * c - d[:, None, :, 0] * s
        rot = jnp.stack([rx, ry], axis=-1) + centroid[:, None]  # (B, A, 4, 2)
        scaled = rot / norm
        inside = jnp.all((scaled >= 0.0) & (scaled < 1.0), axis=(-2, -1))  # (B, A)
        first_a = jnp.argmax(inside, axis=1)
        any_a = jnp.any(inside, axis=1)
        chosen = jnp.take_along_axis(
            rot, first_a[:, None, None, None], axis=1
        )[:, 0]
        quad = jnp.where(any_a[:, None, None], chosen, quad)

    # stage 4: in-bounds translation scaled by translation * difficulty
    lo = -quad.min(axis=1)  # (B, 2)
    hi = norm[None] - quad.max(axis=1)
    t = jax.random.uniform(k_trans, (batch, 2), dtype=dtype)
    shift = (lo + t * (hi - lo)) * (translation * difficulty)
    quad = quad + shift[:, None, :]
    return quad, anchor[None] + shift[:, None, :]


def _patch_corners(batch: int, patch_size, dtype=jnp.float32):
    # same vertex ORDER as the source quads (create_center_patch:
    # [left,bottom], [left,top], [right,top], [right,bottom]) so the 4-point
    # correspondences line up
    corners = jnp.asarray(
        create_center_patch((patch_size[0], patch_size[1])), dtype
    )
    return jnp.tile(corners[None], (batch, 1, 1))


def sample_corner_homographies(
    rng, batch: int, source_size, patch_size, difficulty: float = 0.5,
    translation: float = 1.0, dtype=jnp.float32,
    n_angles: int = 10, max_angle: float = 90.0,
):
    """Sample (B, 3, 3) homographies mapping SOURCE pixel coords to PATCH
    pixel coords (cv2.warpPerspective convention used by `warp_perspective`).
    Targets the difficulty-shrunk CENTER patch of the patch frame like the
    host sampler (create_center_patch(patch_shape))."""
    quad, _ = sample_corner_quads(
        rng, batch, source_size, difficulty, translation, dtype,
        n_angles=n_angles, max_angle=max_angle,
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
    tile=(16, 128), margin: float = 3.0, n_angles: int = 10,
    max_angle: float = 90.0,
):
    """Sample homographies whose every output-tile source footprint PROVABLY
    fits the static `window` of `warp_perspective_tiled` (out-of-window
    pixels would otherwise silently read as zero, corrupting training
    imagery at high difficulty).

    Per batch element, the sampled quad is blended toward its translated
    anchor rectangle (quad_λ = anchor + λ(quad − anchor)) and the largest
    λ ∈ {1, .75, .5, .25, 0} whose footprint fits is kept. λ=0 is an
    axis-aligned scaling with footprint tile*(1−min(difficulty,.75))*scale
    < window (the anchor is size-floored so it stays non-degenerate at
    difficulty → 1), so a safe choice always exists; the clamp only engages
    on the rare extreme-perspective draws.
    """
    quad, anchor = sample_corner_quads(
        rng, batch, source_size, difficulty, translation, jnp.float32,
        n_angles=n_angles, max_angle=max_angle,
    )
    corners = _patch_corners(batch, patch_size, jnp.float32)
    wh, ww = float(window[0]), float(window[1])
    H_best = None
    fits_prev = None
    for lam in (1.0, 0.75, 0.5, 0.25, 0.0):
        q = anchor + lam * (quad - anchor)
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
    n_angles: int = 10,
    max_angle: float = 90.0,
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
            k0, B, (sw, sh), patch_size, difficulty, translation, win,
            n_angles=n_angles, max_angle=max_angle,
        )
        H1 = _sample_window_safe_homography(
            k1, B, (sw, sh), patch_size, difficulty, translation, win,
            n_angles=n_angles, max_angle=max_angle,
        )
        warp = lambda im, H: warp_perspective_tiled(im, H, patch_size, window=win)
    else:
        H0 = sample_corner_homographies(
            k0, B, (sw, sh), patch_size, difficulty, translation,
            dtype=jnp.float32, n_angles=n_angles, max_angle=max_angle,
        )
        H1 = sample_corner_homographies(
            k1, B, (sw, sh), patch_size, difficulty, translation,
            dtype=jnp.float32, n_angles=n_angles, max_angle=max_angle,
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
