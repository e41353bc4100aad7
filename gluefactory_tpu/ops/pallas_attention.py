"""Fused masked attention Pallas kernel for the matchers.

LightGlue/SuperGlue attention operates on token sets of N <= 4096 with head
dim 64 — small enough that K/V fit VMEM entirely, so the kernel is a
single-pass fused softmax(QK^T)V per (batch*head, q-block): the (N x N)
logit matrix never touches HBM (the XLA fallback materializes it). Padding
masks fold into the logits inside the kernel.

Parity contract: `ops.attention.mha` (jnp) is the reference; tests check the
kernel against it in interpret mode. Rotary is applied outside (cheap
elementwise; XLA fuses it into the q/k producer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]  # (BLK_Q, D)
    k = k_ref[0]  # (N, D)
    v = v_ref[0]  # (N, D)
    mask = mask_ref[0]  # (1, N) int32 (1 = valid)
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits * scale
    logits = jnp.where(mask > 0, logits, NEG_INF)  # (BLK_Q, N) via broadcast
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    any_valid = jnp.max(mask) > 0
    # probabilities in the value dtype: for bf16 inputs the (BLK, N) @ (N, D)
    # matmul runs at the MXU's bf16 rate (an f32 matmul is several passes on
    # this hardware) with f32 accumulation; normalization moves after the
    # matmul ((e/s) @ v == (e @ v)/s), which also shrinks the divide from
    # (BLK, N) to (BLK, D). f32 inputs keep an all-f32 compute path.
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(s, 1e-30)
    o_ref[0] = jnp.where(any_valid, o, jnp.zeros_like(o)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_attention(q, k, v, mask_k=None, block_q: int = 512, interpret: bool = False):
    """q (B, H, M, D), k/v (B, H, N, D), mask_k (B, N) bool -> (B, H, M, D).

    Single-pass fused attention; requires N*D*(2 arrays) + BLK_Q*N logits to
    fit VMEM (true for N <= 4096, D <= 128).
    """
    B, H, M, D = q.shape
    N = k.shape[2]
    dtype = q.dtype
    if mask_k is None:
        mask_k = jnp.ones((B, N), bool)
    blk = min(block_q, M)
    pad_m = (-M) % blk
    if pad_m:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
    Mp = M + pad_m

    qf = q.reshape(B * H, Mp, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)
    maskf = jnp.repeat(mask_k.astype(jnp.int32), H, axis=0).reshape(B * H, 1, N)

    grid = (B * H, Mp // blk)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Mp, D), dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    out = out.reshape(B, H, Mp, D)[:, :, :M]
    return out


def attention_available(n: int, d: int) -> bool:
    """Whether the single-pass kernel fits VMEM for this problem size."""
    vmem_needed = (2 * n * d + 256 * n) * 4
    return vmem_needed < 12 * 1024 * 1024


# ---------------------------------------------------------------------------
# Bidirectional shared-QK cross-attention (LightGlue's cross layer,
# reference lightglue.py:195-221): BOTH directions from ONE qk0 @ qk1^T.
#
# The generic flash path pays the (M x N) similarity matmul twice (once per
# direction). Here a single pass over row blocks computes
#   m0 = rowsoftmax(sim) @ v1        (completes within each row block)
#   m1 = colsoftmax(sim)^T @ v0      (flash-style online accumulation across
#                                     row blocks: running column max/sum and
#                                     a rescaled e^T @ v0 accumulator)
# i.e. 3 big matmuls instead of 4, and qk1/v1 stay VMEM-resident.
# ---------------------------------------------------------------------------


def _bidir_kernel(qk0_ref, qk1_ref, v0_ref, v1_ref, m0i_ref, m1i_ref,
                  o0_ref, o1_ref, acc_ref, cmax_ref, csum_ref):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    qk0 = qk0_ref[0]  # (BLK, D)
    qk1 = qk1_ref[0]  # (N, D)
    v0 = v0_ref[0]  # (BLK, D)
    v1 = v1_ref[0]  # (N, D)
    mask0 = m0i_ref[0]  # (1, BLK) int32
    mask1 = m1i_ref[0]  # (1, N) int32
    d = qk0.shape[-1]
    scale = 1.0 / (d**0.5)
    sim = jax.lax.dot_general(
        qk0, qk1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BLK, N)

    # direction 0 -> 1: row softmax over N (mask1 on columns)
    r = jnp.where(mask1 > 0, sim, NEG_INF)
    rm = jnp.max(r, axis=-1, keepdims=True)
    re = jnp.exp(r - rm)
    rs = jnp.sum(re, axis=-1, keepdims=True)
    any1 = jnp.max(mask1) > 0
    # value-dtype probabilities + post-matmul normalization (see _attn_kernel)
    o0 = jax.lax.dot_general(
        re.astype(v1.dtype), v1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(rs, 1e-30)
    o0_ref[0] = jnp.where(any1, o0, jnp.zeros_like(o0)).astype(o0_ref.dtype)

    # direction 1 -> 0: column softmax over M (mask0 on rows), accumulated
    # online across row blocks
    c = jnp.where(jnp.transpose(mask0) > 0, sim, NEG_INF)  # (BLK, N)
    blk_max = jnp.max(c, axis=0, keepdims=True)  # (1, N)

    prev_max = jnp.where(i > 0, cmax_ref[...], jnp.full_like(cmax_ref[...], NEG_INF))
    new_max = jnp.maximum(prev_max, blk_max)
    alpha = jnp.exp(prev_max - new_max)  # (1, N) rescale of previous acc/sum
    # guard: when a column has no valid row yet, c == new_max == NEG_INF and
    # exp(0) would wrongly contribute 1 — zero masked entries explicitly
    e = jnp.where(c > NEG_INF * 0.5, jnp.exp(c - new_max), 0.0)  # (BLK, N)
    blk_sum = jnp.sum(e, axis=0, keepdims=True)
    prev_sum = jnp.where(i > 0, csum_ref[...], jnp.zeros_like(csum_ref[...]))
    prev_acc = jnp.where(i > 0, acc_ref[...], jnp.zeros_like(acc_ref[...]))
    new_sum = prev_sum * alpha + blk_sum
    contrib = jax.lax.dot_general(
        e.astype(v0.dtype), v0, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, D), f32 accumulator
    new_acc = prev_acc * jnp.transpose(alpha) + contrib
    cmax_ref[...] = new_max
    csum_ref[...] = new_sum
    acc_ref[...] = new_acc

    @pl.when(i == n_i - 1)
    def _():
        any0 = new_max[0, :1] > NEG_INF / 2  # any valid row seen at all
        o1 = new_acc / jnp.maximum(jnp.transpose(new_sum), 1e-30)
        o1 = jnp.where(
            jnp.transpose(new_max) > NEG_INF / 2, o1, jnp.zeros_like(o1)
        )
        del any0
        o1_ref[0] = o1.astype(o1_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_bidirectional_attention(
    qk0, qk1, v0, v1, mask0=None, mask1=None, block_q: int = 512,
    interpret: bool = False,
):
    """qk0/v0 (B, H, M, D), qk1/v1 (B, H, N, D); masks (B, M)/(B, N) bool.

    Returns (m0 (B, H, M, D), m1 (B, H, N, D)) — both directions of
    LightGlue's shared-QK cross-attention from one similarity computation.
    Fully-masked opposite sets yield zeros (parity with
    `ops.attention.bidirectional_attention`).
    """
    B, H, M, D = qk0.shape
    N = qk1.shape[2]
    dtype = qk0.dtype
    if mask0 is None:
        mask0 = jnp.ones((B, M), bool)
    if mask1 is None:
        mask1 = jnp.ones((B, N), bool)
    blk = min(block_q, M)
    pad_m = (-M) % blk
    if pad_m:
        qk0 = jnp.pad(qk0, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
        v0 = jnp.pad(v0, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
        mask0 = jnp.pad(mask0, ((0, 0), (0, pad_m)))
    Mp = M + pad_m

    qk0f = qk0.reshape(B * H, Mp, D)
    qk1f = qk1.reshape(B * H, N, D)
    v0f = v0.reshape(B * H, Mp, D)
    v1f = v1.reshape(B * H, N, D)
    m0f = jnp.repeat(mask0.astype(jnp.int32), H, axis=0).reshape(B * H, 1, Mp)
    m1f = jnp.repeat(mask1.astype(jnp.int32), H, axis=0).reshape(B * H, 1, N)

    grid = (B * H, Mp // blk)
    o0, o1 = pl.pallas_call(
        _bidir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, blk), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Mp, D), dtype),
            jax.ShapeDtypeStruct((B * H, N, D), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, D), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
        ],
        interpret=interpret,
    )(qk0f, qk1f, v0f, v1f, m0f, m1f)
    m0 = o0.reshape(B, H, Mp, D)[:, :, :M]
    m1o = o1.reshape(B, H, N, D)
    # zero fully-masked query rows (parity with the jnp path)
    m0 = m0 * mask0[:, None, :M, None].astype(m0.dtype)
    m1o = m1o * mask1[:, None, :, None].astype(m1o.dtype)
    return m0, m1o


# ---------------------------------------------------------------------------
# Differentiable wrapper: fused Pallas forward + reference jnp backward.
# The kernel itself has no VJP; for training we recompute the (cheap at these
# sizes) reference attention inside the backward pass — the fused forward
# still wins the inference-heavy parts (validation, export, per-layer loss
# recomputation is linear ops only).
# ---------------------------------------------------------------------------


def _mha_reference(q, k, v, mask_k):
    dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bhmd,bhnd->bhmn", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask_k is not None:
        logits = jnp.where(mask_k[:, None, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    if mask_k is not None:
        attn = jnp.where(mask_k.any(axis=-1)[:, None, None, None], attn, 0.0)
    return jnp.einsum("bhmn,bhnd->bhmd", attn, v.astype(jnp.float32)).astype(dtype)


def _bidir_reference(qk0, qk1, v0, v1, mask0, mask1):
    """jnp reference for the bidirectional kernel's backward pass (identical
    math to ops.attention.bidirectional_attention's unfused branch)."""
    dtype = qk0.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(qk0.shape[-1], jnp.float32))
    sim = jnp.einsum(
        "bhmd,bhnd->bhmn", qk0, qk1, preferred_element_type=jnp.float32
    ) * scale
    sim01 = jnp.where(mask1[:, None, None, :], sim, NEG_INF)
    sim10 = jnp.where(mask0[:, None, :, None], sim, NEG_INF)
    attn01 = jax.nn.softmax(sim01, axis=-1)
    attn10 = jax.nn.softmax(sim10, axis=-2)
    attn01 = jnp.where(mask1.any(-1)[:, None, None, None], attn01, 0.0)
    attn10 = jnp.where(mask0.any(-1)[:, None, None, None], attn10, 0.0)
    m0 = jnp.einsum("bhmn,bhnd->bhmd", attn01, v1.astype(jnp.float32))
    m1 = jnp.einsum("bhmn,bhmd->bhnd", attn10, v0.astype(jnp.float32))
    m0 = m0 * mask0[:, None, :, None]
    m1 = m1 * mask1[:, None, :, None]
    return m0.astype(dtype), m1.astype(dtype)


@jax.custom_vjp
def flash_bidirectional(qk0, qk1, v0, v1, mask0, mask1):
    return fused_bidirectional_attention(qk0, qk1, v0, v1, mask0, mask1)


def _flash_bidir_fwd(qk0, qk1, v0, v1, mask0, mask1):
    out = fused_bidirectional_attention(qk0, qk1, v0, v1, mask0, mask1)
    return out, (qk0, qk1, v0, v1, mask0, mask1)


def _flash_bidir_bwd(res, g):
    qk0, qk1, v0, v1, mask0, mask1 = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _bidir_reference(a, b, c, d, mask0, mask1),
        qk0, qk1, v0, v1,
    )
    dqk0, dqk1, dv0, dv1 = vjp(g)
    return dqk0, dqk1, dv0, dv1, None, None


flash_bidirectional.defvjp(_flash_bidir_fwd, _flash_bidir_bwd)


@jax.custom_vjp
def flash_mha(q, k, v, mask_k):
    return fused_attention(q, k, v, mask_k)


def _flash_fwd(q, k, v, mask_k):
    return fused_attention(q, k, v, mask_k), (q, k, v, mask_k)


def _flash_bwd(res, g):
    q, k, v, mask_k = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _mha_reference(q_, k_, v_, mask_k), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_mha.defvjp(_flash_fwd, _flash_bwd)
