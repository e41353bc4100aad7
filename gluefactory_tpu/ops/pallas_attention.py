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
    p = e / jnp.maximum(s, 1e-30)
    any_valid = jnp.max(mask) > 0
    o = jax.lax.dot_general(
        p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
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
