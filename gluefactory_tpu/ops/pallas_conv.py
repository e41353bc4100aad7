"""Fused VGG-block Pallas kernel for the SuperPoint/DISK-style backbones.

Computes `maxpool2x2(relu(conv3x3_b(relu(conv3x3_a(x)))))` (or the single-
conv variant) in ONE VMEM-resident pass per row-chunk. Motivation (measured,
v5e, 1024^2 bf16): XLA runs conv(64->64)+pool at ~30% MXU with three HBM
round-trips per block — the early blocks are 62% of the SuperPoint dense
pass. Here each 3x3 conv is 3 MXU matmuls (one per row-tap) with the three
column-taps folded into the contraction dim (K = 3*C_in), the pools are
sublane-regroup maxes, and the inter-conv activations never leave VMEM.

Reference semantics: `gluefactory_nonfree/superpoint.py:209-219` (VGG blocks
conv-relu x2 + 2x2/2 maxpool, SAME zero padding).

Parity contract: `vgg_block_xla` below; tests compare in interpret mode on
CPU and the superpoint forward compares fused vs XLA paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Test hook: when True, consumers (e.g. SuperPoint's fused_backbone gate)
# run the kernel in interpret mode on CPU so integration paths are testable
# without a TPU. Set before first use — the jit caches the resolved flag.
FORCE_INTERPRET = False


def _conv3x3_ref(load, R, Wp, C, cat_ref, wcat, bias):
    """3x3 SAME conv over a ref-backed source with a 1-px halo ring.

    `load(rows, cols)` must return the source slice (ref load). The three
    column taps are folded into the contraction dim by STORING shifted
    loads into `cat_ref` (R, Wp-2, 3C) — ref loads/stores normalize vector
    layout offsets, which value-level slicing + lane concat do not on real
    Mosaic. Row taps are leading-dim slices of the scratch. Returns
    relu(conv + bias): (R-2, Wp-2, N) f32.
    """
    Ro, Wo = R - 2, Wp - 2
    for dx in range(3):
        cat_ref[:R, :Wo, dx * C : (dx + 1) * C] = load(
            slice(None), slice(dx, dx + Wo))
    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            cat_ref[dy : dy + Ro, :Wo, : 3 * C],
            wcat[dy],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Ro, Wo, N)
        acc = part if acc is None else acc + part
    acc = acc + bias.astype(jnp.float32)[None, None, :]
    return jnp.maximum(acc, 0.0)


def _pool2x2(y, scratch_ref):
    """(R, W, C) -> (R/2, W/2, C) max-pool stride 2, via a VMEM scratch +
    strided loads (reshapes that change the sublane/lane split are
    unsupported shape casts on real Mosaic)."""
    R, W, C = y.shape
    scratch_ref[:] = y
    out = None
    for p in range(2):
        for q in range(2):
            v = scratch_ref[
                pl.Slice(p, R // 2, 2), pl.Slice(q, W // 2, 2), :]
            out = v if out is None else jnp.maximum(out, v)
    return out


def _vgg_kernel(x_ref, wa_ref, ba_ref, wb_ref, bb_ref, o_ref, cat_ref,
                ybuf_ref, pool_ref, *, two_convs, pool, out_dtype,
                nck):
    _, R, Wp, Ci = x_ref.shape  # (1, rows + 2*halo, W + 2*halo, C_in)

    def load_x(rows, cols):
        return x_ref[0, rows, cols, :]

    y = _conv3x3_ref(load_x, R, Wp, Ci, cat_ref, wa_ref[:], ba_ref[:])
    if two_convs:
        # conv_b's SAME padding reads ZEROS beyond the image: zero conv_a's
        # ring wherever it lies outside the true image (always the left /
        # right columns; top / bottom rows only for edge chunks — interior
        # chunk halos hold real neighbor values and must be kept)
        Ry, Wy, Cy = y.shape
        pid = pl.program_id(0)
        is_top = (pid % nck) == 0
        is_bot = (pid % nck) == nck - 1
        rows = jax.lax.broadcasted_iota(jnp.int32, (Ry, Wy, Cy), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Ry, Wy, Cy), 1)
        kill = (cols == 0) | (cols == Wy - 1)
        kill |= (rows == 0) & is_top
        kill |= (rows == Ry - 1) & is_bot
        y = jnp.where(kill, jnp.zeros_like(y), y)
        ybuf_ref[:] = y.astype(ybuf_ref.dtype)

        def load_y(rows, cols):
            return ybuf_ref[rows, cols, :]

        # cat_ref is REUSED for conv_b (conv_a's reads are complete)
        y = _conv3x3_ref(load_y, Ry, Wy, Cy, cat_ref, wb_ref[:], bb_ref[:])
    if pool:
        y = _pool2x2(y, pool_ref)
    o_ref[0] = y.astype(out_dtype)


def _fold_w(w):
    """(3, 3, C, N) HWIO -> (3, 3C, N): per row-tap dy, the 3 column taps
    stacked into the contraction dim in dx order (matches the xcat concat)."""
    return jnp.transpose(w, (0, 1, 2, 3)).reshape(3, -1, w.shape[-1])


def vgg_block_xla(x, wa, ba, wb=None, bb=None, pool=True):
    """jnp spec: relu(conv(x, wa)) [-> relu(conv(., wb))] [-> maxpool2x2]."""
    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + b.astype(v.dtype))

    y = conv(x, wa, ba)
    if wb is not None:
        y = conv(y, wb, bb)
    if pool:
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return y


def _pick_rows(H: int, limit: int) -> int:
    best = 0
    for r in range(2, min(limit, H) + 1, 2):
        if H % r == 0:
            best = r
    return best


def fused_vgg_available(H: int, W: int, c_in: int, c_out: int) -> bool:
    # even spatial dims (pool), lane-friendly channels, and a VMEM-sized chunk
    return (
        H % 2 == 0 and W % 2 == 0 and c_in % 8 == 0 and c_out % 8 == 0
        and _pick_rows(
            H, _row_limit(W, c_in, c_out, c_out, True, True)) >= 4
    )


def _lanes(c: int) -> int:
    return ((c + 127) // 128) * 128


def _row_limit(W: int, Ci: int, Cm: int, Co: int, two: bool,
               pool: bool) -> int:
    """Rows per chunk bounding the scoped-VMEM working set (16 MB hard
    limit on v5e). Accounts for 128-lane padding of every buffer: input
    block + cat_a (+ ybuf + cat_b) + pool scratch + two f32 matmul
    accumulators."""
    cat_c = max(3 * Ci, 3 * Cm if two else 0)
    per_row = 2 * W * _lanes(cat_c)  # shared cat scratch (bf16-sized)
    per_row += 2 * W * _lanes(Ci)  # input block (x2 double-buffered)
    per_row += 2 * W * _lanes(Ci)
    if two:
        per_row += 2 * W * _lanes(Cm)  # ybuf
        per_row += 8 * W * _lanes(Cm)  # conv_a acc + partial (f32)
    if pool:
        per_row += 4 * W * _lanes(Co)  # pool scratch (f32)
    per_row += 8 * W * _lanes(Co)  # dot acc + partial (f32)
    budget = 8 * 1024 * 1024
    r = max(2, budget // max(per_row, 1))
    return min(256, r - r % 2)


@functools.partial(
    jax.jit, static_argnames=("two_convs", "pool", "rows", "interpret"))
def fused_vgg_block(x, wa, ba, wb=None, bb=None, *, two_convs=True,
                    pool=True, rows=None, interpret=False):
    """x (B, H, W, C_in) -> (B, H', W', C_out); H' = H/2 when pooled.

    wa (3, 3, C_in, C_mid), wb (3, 3, C_mid, C_out) HWIO; biases (C,).
    SAME zero padding, stride 1, relu after each conv, then 2x2/2 maxpool.
    """
    B, H, W, Ci = x.shape
    halo = 2 if two_convs else 1
    if wb is None:
        two_convs = False
    Co = (wb if two_convs else wa).shape[-1]
    if rows is None:
        rows = _pick_rows(
            H, _row_limit(W, Ci, wa.shape[-1], Co, two_convs, pool))
    nck = H // rows

    xp = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    starts = jnp.arange(nck) * rows
    idx = starts[:, None] + jnp.arange(rows + 2 * halo)[None, :]
    chunks = xp[:, idx].reshape(B * nck, rows + 2 * halo, W + 2 * halo, Ci)

    wac = _fold_w(wa)
    if two_convs:
        wbc = _fold_w(wb)
    else:  # placeholders keep the pallas_call signature static
        wbc = jnp.zeros((3, 3 * wa.shape[-1], Co), wa.dtype)
        bb = jnp.zeros((Co,), wa.dtype)

    Ho = rows // 2 if pool else rows
    Wo = W // 2 if pool else W
    kern = functools.partial(
        _vgg_kernel, two_convs=two_convs, pool=pool, out_dtype=x.dtype,
        nck=nck)
    from jax.experimental.pallas import tpu as pltpu

    Cm = wa.shape[-1]
    Rh = rows + 2 * halo
    dummy = (8, 128, 8)
    # ONE cat scratch shared by both convs (used strictly sequentially) —
    # sized for the larger of the two K-folds
    cat_c = max(3 * Ci, 3 * Cm if two_convs else 0)
    scratches = [
        pltpu.VMEM((Rh, W + 2 * halo - 2, cat_c), x.dtype),  # cat (shared)
        pltpu.VMEM((Rh - 2, W + 2, Cm) if two_convs else dummy, x.dtype),
        pltpu.VMEM((rows, W, Co) if pool else dummy, jnp.float32),  # pool
    ]
    out = pl.pallas_call(
        kern,
        grid=(B * nck,),
        scratch_shapes=scratches,
        in_specs=[
            pl.BlockSpec((1, rows + 2 * halo, W + 2 * halo, Ci),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(wac.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(ba.shape, lambda i: (0,)),
            pl.BlockSpec(wbc.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bb.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, Co), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nck, Ho, Wo, Co), x.dtype),
        interpret=interpret,
    )(chunks, wac, ba, wbc, bb)
    return out.reshape(B, nck * Ho, Wo, Co)


# ---------------------------------------------------------------------------
# Differentiable wrapper: fused Pallas forward + XLA-recompute backward
# (extractors are frozen in all matcher recipes, so the backward path is a
# rarely-taken safety net, mirroring ops/pallas_attention.flash_mha).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _vgg_ad(two_convs, pool, interpret, x, wa, ba, wb, bb):
    return fused_vgg_block(
        x, wa, ba, wb if two_convs else None, bb if two_convs else None,
        two_convs=two_convs, pool=pool, interpret=interpret)


def _vgg_ad_fwd(two_convs, pool, interpret, x, wa, ba, wb, bb):
    out = _vgg_ad(two_convs, pool, interpret, x, wa, ba, wb, bb)
    return out, (x, wa, ba, wb, bb)


def _vgg_ad_bwd(two_convs, pool, interpret, res, g):
    x, wa, ba, wb, bb = res

    def ref(x, wa, ba, wb, bb):
        return vgg_block_xla(
            x, wa, ba, wb if two_convs else None, bb if two_convs else None,
            pool=pool)

    _, vjp = jax.vjp(ref, x, wa, ba, wb, bb)
    return vjp(g)


_vgg_ad.defvjp(_vgg_ad_fwd, _vgg_ad_bwd)


def vgg_block(x, wa, ba, wb=None, bb=None, *, pool=True):
    """Differentiable fused VGG block (see `fused_vgg_block`)."""
    two = wb is not None
    wa, ba = wa.astype(x.dtype), ba.astype(x.dtype)
    if not two:
        wb = jnp.zeros((1, 1, 1, 1), x.dtype)
        bb = jnp.zeros((1,), x.dtype)
    else:
        wb, bb = wb.astype(x.dtype), bb.astype(x.dtype)
    return _vgg_ad(two, pool, FORCE_INTERPRET, x, wa, ba, wb, bb)
