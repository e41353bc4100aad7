"""TPU-native DoG SIFT: detection, orientation, and descriptor in pure JAX.

Device-side replacement for the host OpenCV/pycolmap SIFT backends of the
reference (`models/extractors/sift.py:80-234`, kornia variant
`models/extractors/sift_kornia.py:7-46`) — the whole scale-space pipeline
(Gaussian pyramid, DoG extrema, quadratic refinement, edge rejection,
orientation histogram, 4x4x8 gradient descriptor) runs inside jit with
static shapes, so SIFT-based recipes need no `pure_callback` round-trips.

Deviations from OpenCV (documented, conf-controllable):
  - fixed octave/candidate budgets (static shapes) with validity masks;
  - one Newton step of extremum refinement instead of up to five;
  - a single dominant orientation per keypoint (cv2 may emit multiple);
  - optional initial 2x upsampling off by default (`double_image`).

Numerical spec follows Lowe (IJCV'04) with OpenCV's constants: sigma0=1.6,
3 scales/octave, contrast threshold 0.04 (applied as cv2 does on the
[0, 1]-scaled DoG: th = 0.5 * C / n_scales at the prefilter, full C after
interpolation), edge ratio 10, orientation histogram sigma 1.5*sigma with
radius 3*1.5*sigma, descriptor window 4x4 cells of 3*sigma.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _gauss_kernel1d(sigma: float) -> jnp.ndarray:
    r = max(1, int(round(4.0 * sigma)))
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, replicate padding. x: (B, H, W)."""
    if sigma <= 0:
        return x
    k = _gauss_kernel1d(sigma)
    r = (k.shape[0] - 1) // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, :, :, None], k[:, None, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(
        xp[:, :, :, None], k[None, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    return x


def build_octave(x: jnp.ndarray, n_scales: int, sigma0: float):
    """Gaussian levels (list of n_scales+3) and DoGs (n_scales+2) for one
    octave whose base image already has blur sigma0."""
    k = 2.0 ** (1.0 / n_scales)
    levels = [x]
    sig_prev = sigma0
    for i in range(1, n_scales + 3):
        sig_total = sigma0 * (k**i)
        sig_diff = math.sqrt(max(sig_total**2 - sig_prev**2, 1e-8))
        levels.append(gaussian_blur(levels[-1], sig_diff))
        sig_prev = sig_total
    gauss = jnp.stack(levels, axis=1)  # (B, S+3, H, W)
    dogs = gauss[:, 1:] - gauss[:, :-1]  # (B, S+2, H, W)
    return gauss, dogs


def _shift2(x, dy, dx):
    """Zero-padded spatial shift of (..., H, W)."""
    return jnp.roll(x, (dy, dx), axis=(-2, -1))


def find_extrema_mask(dogs: jnp.ndarray, pre_thresh: float) -> jnp.ndarray:
    """(B, S+2, H, W) -> (B, S, H, W) bool: 26-neighbor extrema of the
    middle S scales with |value| above the prefilter threshold."""
    B, S2, H, W = dogs.shape
    c = dogs[:, 1:-1]  # centers (B, S, H, W)
    is_max = jnp.ones_like(c, bool)
    is_min = jnp.ones_like(c, bool)
    for ds in (-1, 0, 1):
        nb_plane = dogs[:, 1 + ds : S2 - 1 + ds]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                nb = _shift2(nb_plane, -dy, -dx)
                is_max &= c >= nb
                is_min &= c <= nb
    mask = (is_max | is_min) & (jnp.abs(c) > pre_thresh)
    # exclude the 1-px border (and roll wrap-around)
    ys = jnp.arange(H)[None, None, :, None]
    xs = jnp.arange(W)[None, None, None, :]
    mask &= (ys >= 1) & (ys < H - 1) & (xs >= 1) & (xs < W - 1)
    return mask


def _quad_refine(dogs, sidx, yidx, xidx):
    """One Newton step of the 3D quadratic fit at integer extremum
    (s, y, x) per candidate. dogs (S+2, H, W); indices (K,).
    Returns (offset (K, 3) in (s, y, x), value (K,), edge_ok (K,))."""

    def at(ds, dy, dx):
        return dogs[sidx + 1 + ds, yidx + dy, xidx + dx]

    v = at(0, 0, 0)
    dx = 0.5 * (at(0, 0, 1) - at(0, 0, -1))
    dy = 0.5 * (at(0, 1, 0) - at(0, -1, 0))
    ds = 0.5 * (at(1, 0, 0) - at(-1, 0, 0))
    dxx = at(0, 0, 1) + at(0, 0, -1) - 2 * v
    dyy = at(0, 1, 0) + at(0, -1, 0) - 2 * v
    dss = at(1, 0, 0) + at(-1, 0, 0) - 2 * v
    dxy = 0.25 * (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1))
    dxs = 0.25 * (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1))
    dys = 0.25 * (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0))

    # solve H * off = -g for (x, y, s) via the 3x3 adjugate
    H = jnp.stack(
        [
            jnp.stack([dxx, dxy, dxs], -1),
            jnp.stack([dxy, dyy, dys], -1),
            jnp.stack([dxs, dys, dss], -1),
        ],
        -2,
    )  # (K, 3, 3)
    g = jnp.stack([dx, dy, ds], -1)
    det = jnp.linalg.det(H)
    off = -jnp.linalg.solve(
        H + 1e-12 * jnp.eye(3)[None], g[..., None]
    )[..., 0]
    off = jnp.where(jnp.abs(det)[..., None] > 1e-12, off, jnp.zeros_like(off))
    off = jnp.clip(off, -1.5, 1.5)
    value = v + 0.5 * (g * off).sum(-1)

    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = 10.0
    edge_ok = (det2 > 0) & (tr * tr * r < (r + 1) ** 2 * det2)
    return off, value, edge_ok


def _extract_patches(gauss, lvl, yc, xc, radius: int):
    """Integer-centered (2r+1)^2 patches from each candidate's own pyramid
    level. gauss (S+3, H, W); lvl/yc/xc int (K,). Out-of-image -> 0."""
    d = 2 * radius + 1
    pad = jnp.pad(gauss, ((0, 0), (radius, radius), (radius, radius)))

    def one(l, y, x):
        return jax.lax.dynamic_slice(pad, (l, y, x), (1, d, d))[0]

    return jax.vmap(one)(lvl, yc, xc)  # pad shifts centers by +radius


def _patch_grads(patch):
    """(K, d, d) -> gradient magnitude and angle maps (K, d-2, d-2)."""
    gx = 0.5 * (patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2])
    gy = 0.5 * (patch[:, 2:, 1:-1] - patch[:, :-2, 1:-1])
    return jnp.sqrt(gx * gx + gy * gy), jnp.arctan2(gy, gx)


def _orientation(mag, ang, sigma, radius: int):
    """Dominant gradient orientation per candidate (static window).
    mag/ang (K, d-2, d-2); sigma (K,). Returns theta (K,)."""
    di = jnp.arange(-(radius - 1), radius, dtype=jnp.float32)
    d2 = di[None, :, None] ** 2 + di[None, None, :] ** 2
    sig_w = 1.5 * sigma
    w = jnp.exp(-d2 / (2.0 * sig_w[:, None, None] ** 2))
    w = jnp.where(d2 <= (3.0 * sig_w[:, None, None]) ** 2, w, 0.0)
    K = mag.shape[0]
    wm = (mag * w).reshape(K, -1)
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32)
    bins = jnp.clip(bins, 0, 35).reshape(K, -1)
    hist = jnp.zeros((K, 36), jnp.float32).at[
        jnp.arange(K)[:, None], bins
    ].add(wm)  # (K, 36)
    # cv2-style smoothing (two passes of [1, 4, 6, 4, 1] / 16)
    for _ in range(2):
        hist = (
            6 * hist
            + 4 * (jnp.roll(hist, 1, -1) + jnp.roll(hist, -1, -1))
            + (jnp.roll(hist, 2, -1) + jnp.roll(hist, -2, -1))
        ) / 16.0
    b = jnp.argmax(hist, axis=-1)
    hb = jnp.take_along_axis(hist, b[:, None], -1)[:, 0]
    hl = jnp.take_along_axis(hist, ((b - 1) % 36)[:, None], -1)[:, 0]
    hr = jnp.take_along_axis(hist, ((b + 1) % 36)[:, None], -1)[:, 0]
    denom = hl - 2 * hb + hr
    frac = jnp.where(jnp.abs(denom) > 1e-8, 0.5 * (hl - hr) / denom, 0.0)
    theta = (b.astype(jnp.float32) + 0.5 + frac) * (2 * jnp.pi / 36) - jnp.pi
    return theta


def _descriptor(mag, ang, sigma, theta, radius: int):
    """4x4x8 SIFT descriptor: rotated bilinear sampling of the patch
    gradient maps (K, d-2, d-2). Returns (K, 128) L2-normalized."""
    K = mag.shape[0]
    d = 2 * radius + 1

    # sample grid: 4x4 cells x 4x4 samples/cell in rotated sigma units
    hist_w = 3.0 * sigma  # cell width in px
    n_samp = 16  # per axis over the 4-cell window
    u = (jnp.arange(n_samp, dtype=jnp.float32) + 0.5) / n_samp * 4.0 - 2.0
    uu, vv = jnp.meshgrid(u, u, indexing="xy")  # cell coords in [-2, 2)
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    # pixel offsets (K, n, n)
    px = (uu[None] * cs[:, None, None] - vv[None] * sn[:, None, None]) * hist_w[:, None, None]
    py = (uu[None] * sn[:, None, None] + vv[None] * cs[:, None, None]) * hist_w[:, None, None]
    # bilinear read of mag/ang grids (centered at radius-1)
    c = radius - 1
    sx = px + c
    sy = py + c
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, d - 4)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, d - 4)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    inb = (sx >= 0) & (sx <= d - 3) & (sy >= 0) & (sy <= d - 3)

    def read(m, y, x):
        flat = m.reshape(K, -1)
        idx = (y * (d - 2) + x).reshape(K, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(y.shape)

    m00 = read(mag, y0, x0)
    m01 = read(mag, y0, x0 + 1)
    m10 = read(mag, y0 + 1, x0)
    m11 = read(mag, y0 + 1, x0 + 1)
    msamp = (
        m00 * (1 - fx) * (1 - fy) + m01 * fx * (1 - fy)
        + m10 * (1 - fx) * fy + m11 * fx * fy
    )
    asamp = read(ang, jnp.round(sy).astype(jnp.int32).clip(0, d - 3),
                 jnp.round(sx).astype(jnp.int32).clip(0, d - 3))
    rel = (asamp - theta[:, None, None]) % (2 * jnp.pi)

    wgauss = jnp.exp(-(uu**2 + vv**2)[None] / (2 * (4.0 / 2) ** 2))
    msamp = msamp * wgauss * inb

    # trilinear binning: cell (4x4) x orientation (8)
    cx = uu[None] + 2.0 - 0.5  # cell-space coords in [0, 4)
    cy = vv[None] + 2.0 - 0.5
    ob = rel / (2 * jnp.pi) * 8.0 - 0.5

    def soft_assign(coord, n_bins):
        b0 = jnp.floor(coord).astype(jnp.int32)
        f = coord - b0
        return b0, f

    bx0, fxc = soft_assign(cx, 4)
    by0, fyc = soft_assign(cy, 4)
    bo0, foc = soft_assign(ob, 8)
    desc = jnp.zeros((K, 128), jnp.float32)
    kk = jnp.arange(K)[:, None, None]
    for dyc in (0, 1):
        for dxc in (0, 1):
            for doc in (0, 1):
                wy = jnp.where(dyc == 0, 1 - fyc, fyc)
                wx = jnp.where(dxc == 0, 1 - fxc, fxc)
                wo = jnp.where(doc == 0, 1 - foc, foc)
                yb = by0 + dyc
                xb = bx0 + dxc
                okc = (yb >= 0) & (yb < 4) & (xb >= 0) & (xb < 4)
                w = msamp * wy * wx * wo * okc
                yi = jnp.clip(yb, 0, 3)
                xi = jnp.clip(xb, 0, 3)
                oi = (bo0 + doc) % 8
                flat_idx = (yi * 4 + xi) * 8 + oi  # (K, n, n)
                desc = desc.at[kk, flat_idx].add(w)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return desc


@functools.partial(
    jax.jit,
    static_argnames=("max_kpts", "n_octaves", "n_scales", "double_image"))
def sift_detect(images: jnp.ndarray, max_kpts: int, *, n_octaves: int = 4,
                n_scales: int = 3, sigma0: float = 1.6,
                contrast_thresh: float = 0.04, double_image: bool = False):
    """images (B, H, W) grayscale [0, 1] -> dict of static-shape SIFT
    outputs: keypoints (B, K, 2) COLMAP +0.5 px, keypoint_scores,
    scales (cv2 `size` convention = diameter), oris (rad), descriptors
    (B, K, 128), keypoint_mask."""
    B, H, W = images.shape
    K = max_kpts
    x = images.astype(jnp.float32)
    if double_image:
        x = jax.image.resize(x, (B, 2 * H, 2 * W), "linear")
        first_sigma = math.sqrt(max(sigma0**2 - 4 * 0.5**2, 0.01))
        scale_mul = 0.5
    else:
        first_sigma = math.sqrt(max(sigma0**2 - 0.5**2, 0.01))
        scale_mul = 1.0
    x = gaussian_blur(x, first_sigma)

    pre_th = 0.5 * contrast_thresh / n_scales
    per_oct = max(K // 2, 256)

    cand = {"pos": [], "score": [], "scale": [], "ori": [], "desc": [],
            "valid": []}
    for o in range(n_octaves):
        if x.shape[-2] < 16 or x.shape[-1] < 16:
            break
        gauss, dogs = build_octave(x, n_scales, sigma0)
        mask = find_extrema_mask(dogs, pre_th)  # (B, S, h, w)
        Bh, S, h, w = mask.shape
        resp = jnp.where(mask, jnp.abs(dogs[:, 1:-1]), 0.0)
        flat = resp.reshape(B, -1)
        vals, idx = jax.lax.top_k(flat, per_oct)
        sidx = idx // (h * w)
        yidx = (idx % (h * w)) // w
        xidx = idx % w
        yidx = jnp.clip(yidx, 1, h - 2)
        xidx = jnp.clip(xidx, 1, w - 2)

        # static window radius sized for the largest in-octave sigma
        radius = 20

        def per_image(dg, ga, si, yi, xi, va):
            off, value, edge_ok = _quad_refine(dg, si, yi, xi)
            ok = va > 0
            ok &= jnp.abs(value) > contrast_thresh / n_scales
            ok &= edge_ok
            ok &= jnp.abs(off).max(-1) < 1.0
            sf = si.astype(jnp.float32) + off[:, 2]
            yf = yi.astype(jnp.float32) + off[:, 1]
            xf = xi.astype(jnp.float32) + off[:, 0]
            sig = sigma0 * (2.0 ** (sf / n_scales))  # octave-relative sigma
            lvl = jnp.clip(si + 1, 0, n_scales + 2)
            patch = _extract_patches(ga, lvl, yi, xi, radius)
            mag, ang = _patch_grads(patch)
            theta = _orientation(mag, ang, sig, radius)
            desc = _descriptor(mag, ang, sig, theta, radius)
            return value, ok, yf, xf, sig, theta, desc

        values, oks, yfs, xfs, sigs, thetas, descs = jax.vmap(per_image)(
            dogs, gauss, sidx, yidx, xidx, vals)

        # cv2 kpt.pt convention (pixel-index coords, no +0.5) — matches the
        # host backend and the reference extractor bit-for-bit downstream
        scale_px = (2.0**o) * scale_mul
        pos = jnp.stack([xfs * scale_px, yfs * scale_px], axis=-1)
        cand["pos"].append(pos)
        cand["score"].append(jnp.abs(values))
        cand["scale"].append(sigs * 2.0 * scale_px)  # cv2 size (diameter)
        cand["ori"].append(thetas)
        cand["desc"].append(descs)
        cand["valid"].append(oks)
        # next octave: downsample the s-th gaussian level
        x = gauss[:, n_scales][:, ::2, ::2]

    pos = jnp.concatenate(cand["pos"], axis=1)
    score = jnp.concatenate(cand["score"], axis=1)
    scale = jnp.concatenate(cand["scale"], axis=1)
    ori = jnp.concatenate(cand["ori"], axis=1)
    desc = jnp.concatenate(cand["desc"], axis=1)
    valid = jnp.concatenate(cand["valid"], axis=1)

    score = jnp.where(valid, score, 0.0)
    vals, top = jax.lax.top_k(score, K)
    take = lambda a: jnp.take_along_axis(
        a, top.reshape(B, K, *([1] * (a.ndim - 2))), axis=1)
    return {
        "keypoints": take(pos),
        "keypoint_scores": vals,
        "scales": take(scale),
        "oris": take(ori),
        "descriptors": take(desc),
        "keypoint_mask": jnp.take_along_axis(valid, top, axis=1) & (vals > 0),
    }
