"""Fused keypoint-detection decode Pallas kernel.

Replaces the XLA decode chain `simple_nms -> remove_borders -> area mask ->
4x4 tile max/argmax` (see `ops/nms.py`; behavioral spec: reference
`gluefactory_nonfree/superpoint.py:60-94`) with ONE VMEM-resident pass per
row-chunk: the five full-resolution `reduce_window` sweeps and the tile
transpose never round-trip HBM. Downstream (`lax.top_k` over the H/4 * W/4
tile maxima + coordinate reconstruction) stays in XLA, where it is cheap.

Design (v5e):
  - grid = (B * H/CHUNK,); each program handles CHUNK rows of one image,
    pre-haloed with HALO = (2*iters+1)*radius rows per side — the exact
    dependence radius of iterated NMS — built by a cheap XLA row gather.
    Halo rows outside the image are -inf, reproducing `reduce_window`'s
    -inf-init SAME padding at the top/bottom edges.
  - max-pools are separable shifted maxes in VMEM with log-doubling
    composition (3 shifts per direction per axis for radius 4).
  - the within-tile row reduction (4 rows -> 1) uses a sublane regroup
    reshape (lane dim untouched — Mosaic-friendly); the lane-tile reduction
    (W -> W/4) runs in XLA on the 4x-smaller output.

Tie rule: within a tile, the reported argmax is the smallest dx among
maximal columns, then the smallest dy in that column (the pure-XLA path
uses row-major first-max). The two differ only when a tile holds two
EQUAL maxima: all-suppressed tiles give (0, 0) under both rules, and the
first-round NMS spacing guarantee (> radius apart) leaves only the case
of equal-valued *revived* survivors (iteration-2 re-additions of
bf16-quantized equal neighbors) — same score either way, so downstream
selection is equivalent (the reference breaks such ties by memory order).

Parity contract: `ops.nms` composition is the spec; tests compare the
kernel in interpret mode and on-device against it on strictly-positive
random score maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Test hook (see ops/pallas_conv.py): lets the SuperPoint fused_detect gate
# run this kernel in interpret mode on CPU.
FORCE_INTERPRET = False


def _shift(x: jnp.ndarray, s: int, axis: int) -> jnp.ndarray:
    """result[i] = x[i+s] along `axis`, CYCLIC (pure `pltpu.roll`, no edge
    fill). Static s != 0.

    Mask-free on purpose: masking each shift (iota + where) tripled the VPU
    work and made the kernel slower than the XLA path it replaces. Safety
    argument: the caller pre-pads BOTH axes with a -inf halo at least as
    wide as the total shift distance of the whole NMS chain (5*radius), so
    wrap-around garbage only ever lands inside the halo and never reaches
    the central crop that is written out."""
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[axis]
    return pltpu.roll(x, (-s) % n, axis)  # roll shift must be >= 0


def _shift_rows(x: jnp.ndarray, s: int) -> jnp.ndarray:
    return _shift(x, s, 0)


def _shift_cols(x: jnp.ndarray, s: int) -> jnp.ndarray:
    return _shift(x, s, 1)


def _window_max_1d(x: jnp.ndarray, r: int, shift) -> jnp.ndarray:
    """max over window [i-r, i+r] along one axis, log-doubling shifts."""
    # forward: m[i] = max x[i .. i+r]
    m, span = x, 1
    while 2 * span <= r + 1:
        m = jnp.maximum(m, shift(m, span))
        span *= 2
    if span < r + 1:
        m = jnp.maximum(m, shift(m, r + 1 - span))
    # backward over m: out[i] = max m[i-r .. i]  ==  max x[i-r .. i+r]
    out, span = m, 1
    while 2 * span <= r + 1:
        out = jnp.maximum(out, shift(out, -span))
        span *= 2
    if span < r + 1:
        out = jnp.maximum(out, shift(out, -(r + 1 - span)))
    return out


def _max_pool(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return _window_max_1d(_window_max_1d(x, r, _shift_rows), r, _shift_cols)


def _nms_block(s: jnp.ndarray, radius: int, iters: int) -> jnp.ndarray:
    """Iterated NMS on an (H, W) f32 block (`ops/nms.py` simple_nms
    semantics). -inf marks out-of-image halo; `where(supp, 0, s)` must not
    promote such entries to 0 (the reference has no pixels there at all),
    so -inf source entries are re-imposed each iteration."""
    zeros = jnp.zeros_like(s)
    neg = s == -jnp.inf
    max_mask = s == _max_pool(s, radius)
    for _ in range(iters):
        supp = _max_pool(
            jnp.where(max_mask, jnp.float32(1.0), jnp.float32(0.0)), radius
        ) > 0
        ss = jnp.where(supp, zeros, s)
        ss = jnp.where(neg, s, ss)
        new_max = ss == _max_pool(ss, radius)
        max_mask = max_mask | (new_max & ~supp)
    return jnp.where(max_mask & ~neg, s, zeros)


def _detect_kernel(chunk_ref, meta_ref, rmax_ref, rarg_ref, *,
                   radius, iters, halo, border, tile, hc):
    """chunk_ref (1, CHUNK+2*halo, Wp) with -inf halo rows AND columns
    (image column j lives at lane j + hc); meta_ref (1, 1, 128) f32
    [w_true, h_true, global_row_offset, ...pad]; outputs
    (1, CHUNK/tile, Wp): per (row-group, lane) the max over the tile rows
    + its dy."""
    x = chunk_ref[0].astype(jnp.float32)
    Hh, Wp = x.shape
    chunk = Hh - 2 * halo

    nms = _nms_block(x, radius, iters)[halo : halo + chunk]  # (CHUNK, Wp)

    w_true = meta_ref[0, 0, 0]
    h_true = meta_ref[0, 0, 1]
    row_off = meta_ref[0, 0, 2]
    b = jnp.float32(border)
    # Mosaic iota must be integer-typed; cast to f32 for the comparisons
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, Wp), 0).astype(
        jnp.float32) + row_off
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, Wp), 1).astype(
        jnp.float32) - jnp.float32(hc)
    keep = (rows >= b) & (cols >= b) & (rows < h_true - b) & (cols < w_true - b)
    nms = jnp.where(keep, nms, jnp.zeros_like(nms))

    # rows -> row-tiles: per-row "value of group row r+dy" via cyclic rolls
    # (first-max scan over dy), then every tile-th row extracted with a
    # 0/1 selection-matrix matmul — sublane-strided loads require a
    # 128-lane memref and sublane-splitting reshapes are unsupported casts
    best = nms
    barg = jnp.zeros_like(nms)
    for dy in range(1, tile):
        cand = _shift(nms, dy, 0)  # row r sees nms[r+dy]
        upd = cand > best
        best = jnp.where(upd, cand, best)
        barg = jnp.where(upd, jnp.float32(dy), barg)
    Ht = chunk // tile
    si = jax.lax.broadcasted_iota(jnp.int32, (Ht, chunk), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (Ht, chunk), 1)
    sel = (sj == si * tile).astype(jnp.float32)  # (Ht, chunk)
    dots = (((1,), (0,)), ((), ()))
    rmax_ref[0] = jax.lax.dot_general(
        sel, best, dots, preferred_element_type=jnp.float32)
    rarg_ref[0] = jax.lax.dot_general(
        sel, barg, dots, preferred_element_type=jnp.float32
    ).astype(jnp.int32)


def nms_tile_reduce_xla(scores, radius, iters, border, tile, true_size=None):
    """jnp spec of the fused kernel (composition of the existing ops)."""
    from .nms import remove_borders, simple_nms

    s = simple_nms(scores.astype(jnp.float32), radius, iters)
    s = remove_borders(s, border)
    B, H, W = s.shape
    if true_size is not None:
        xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        b_ = float(border)
        in_area = (xs < true_size[:, 0][:, None, None] - b_) & (
            ys < true_size[:, 1][:, None, None] - b_
        )
        s = jnp.where(in_area, s, jnp.zeros_like(s))
    Ht, Wt = H // tile, W // tile
    blocks = s.reshape(B, Ht, tile, Wt, tile).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(B, Ht, Wt, tile * tile)
    return blocks.max(axis=-1), blocks.argmax(axis=-1).astype(jnp.int32)


def _pick_chunk(H: int, tile: int, target: int = 256) -> int:
    """Largest divisor of H that is <= target and a multiple of tile."""
    best = 0
    for c in range(tile, min(target, H) + 1, tile):
        if H % c == 0:
            best = c
    return best


def fused_detect_available(H: int, W: int, tile: int = 4) -> bool:
    # any W works (columns are -inf halo-padded to a 128-multiple inside)
    return W % tile == 0 and _pick_chunk(H, tile) >= 8 * tile


@functools.partial(
    jax.jit,
    static_argnames=("radius", "iters", "border", "tile", "interpret"),
)
def fused_nms_tile_reduce(scores, true_size=None, *, radius: int = 4,
                          iters: int = 2, border: int = 4, tile: int = 4,
                          interpret: bool = False):
    """scores (B, H, W) float -> (tile_max (B, H/t, W/t) f32,
    tile_arg (B, H/t, W/t) i32 in [0, t*t) row-major within the tile).

    true_size: optional (B, 2) [w, h] true image extent; scores beyond it
    are masked (bucket-padded buffers, cf. superpoint._forward)."""
    B, H, W = scores.shape
    halo = (2 * iters + 1) * radius
    chunk = _pick_chunk(H, tile)
    nck = H // chunk
    if true_size is None:
        true_size = jnp.tile(jnp.asarray([[W, H]], jnp.float32), (B, 1))

    s = scores.astype(jnp.float32)
    # -inf halo on BOTH axes: rows = chunk overlap + top/bottom edge
    # semantics; columns = edge semantics + wrap-around absorption for the
    # kernel's mask-free cyclic shifts (see _shift). Column pads must cover
    # the full shift halo on both sides (any radius/iters combination), then
    # the padded width rounds up to a 128-lane multiple.
    hc = max(64, -(-halo // 64) * 64)
    Wp = W + 2 * hc + ((-(W + 2 * hc)) % 128)
    padded = jnp.pad(
        s, ((0, 0), (halo, halo), (hc, Wp - W - hc)),
        constant_values=-jnp.inf)
    starts = jnp.arange(nck) * chunk
    idx = starts[:, None] + jnp.arange(chunk + 2 * halo)[None, :]
    chunks = padded[:, idx].reshape(B * nck, chunk + 2 * halo, Wp)

    meta = jnp.concatenate(
        [
            jnp.repeat(true_size.astype(jnp.float32), nck, axis=0),
            jnp.tile(starts.astype(jnp.float32), B)[:, None],
        ],
        axis=1,
    )
    # (N, 1, 128): the block's last-two dims must equal the array's
    meta = jnp.pad(meta, ((0, 0), (0, 125)))[:, None, :]

    kern = functools.partial(_detect_kernel, radius=radius, iters=iters,
                             halo=halo, border=border, tile=tile, hc=hc)
    rmax, rarg = pl.pallas_call(
        kern,
        grid=(B * nck,),
        in_specs=[
            pl.BlockSpec((1, chunk + 2 * halo, Wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk // tile, Wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, chunk // tile, Wp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * nck, chunk // tile, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B * nck, chunk // tile, Wp), jnp.int32),
        ],
        interpret=interpret,
    )(chunks, meta)

    # crop the column halo, then lane-tile reduce in XLA (4x-smaller array)
    Ht, Wt = H // tile, W // tile
    rmax = rmax[:, :, hc : hc + W].reshape(B, Ht, Wt, tile)
    rarg = rarg[:, :, hc : hc + W].reshape(B, Ht, Wt, tile)
    dx = jnp.argmax(rmax, axis=-1)
    tile_max = jnp.take_along_axis(rmax, dx[..., None], axis=-1)[..., 0]
    dy = jnp.take_along_axis(rarg, dx[..., None], axis=-1)[..., 0]
    tile_arg = dy * tile + dx.astype(jnp.int32)
    return tile_max, tile_arg


def detect_keypoints(scores, k: int, threshold: float, *, radius: int = 4,
                     iters: int = 2, border: int = 4, true_size=None,
                     interpret: bool | None = None):
    """Full decode: fused NMS/reduce kernel + XLA top-k + coordinates.

    Drop-in for `simple_nms -> remove_borders -> area-mask ->
    top_k_keypoints(tile=4)` (exact: NMS survivors are > radius apart, so a
    4x4 tile holds at most one positive survivor). Returns (kpts (B, k, 2)
    COLMAP +0.5 coords, scores (B, k), valid (B, k))."""
    tile = 4
    if interpret is None:
        interpret = FORCE_INTERPRET
    B, H, W = scores.shape
    tmax, targ = fused_nms_tile_reduce(
        scores, true_size, radius=radius, iters=iters, border=border,
        tile=tile, interpret=interpret)
    Wt = W // tile
    vals, tidx = jax.lax.top_k(tmax.reshape(B, -1), k)
    # threshold in the input dtype (bit-parity with the XLA bf16 path)
    vals = vals.astype(scores.dtype)
    inner = jnp.take_along_axis(targ.reshape(B, -1), tidx, axis=-1)
    ty = (tidx // Wt).astype(jnp.float32)
    tx = (tidx % Wt).astype(jnp.float32)
    iy = (inner // tile).astype(jnp.float32)
    ix = (inner % tile).astype(jnp.float32)
    kpts = jnp.stack([tx * tile + ix, ty * tile + iy], axis=-1) + 0.5
    valid = vals > threshold
    return kpts, vals, valid
