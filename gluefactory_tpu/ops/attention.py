"""Attention primitives for the matchers: rotary position encoding and
masked multi-head attention.

Role of reference `models/matchers/lightglue.py:97-221` (flash/SDP attention,
rotary self-attention, shared-QK bidirectional cross-attention). The jnp path
here is the reference implementation; `ops/pallas/attention.py` provides the
fused TPU kernel with identical semantics (tested for parity). At LightGlue's
scale (<= 4096 tokens, head_dim 64) XLA already fuses QK^T+softmax+PV well on
the MXU; the Pallas kernel additionally fuses the rotary application and mask.

Rotary convention (must match the official LightGlue weights for conversion):
channel pairs are adjacent (2i, 2i+1); cos/sin are per-pair, i.e. shape
(..., N, D/2), applied as (x_even * cos - x_odd * sin, x_even * sin + x_odd * cos).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise (-x2, x1) rotation on adjacent channel pairs."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply a rotary encoding. x: (..., N, D); cos/sin: (..., N, D/2).

    Computed in x's dtype: the angles derive from f32 keypoint coordinates,
    and without the cast a single f32 rotary multiply silently upcasts every
    downstream matcher layer (attention, FFNs, the next layer's projections)
    to f32 — measured 78.3 -> see ROADMAP round-4 perf log for the bf16
    recovery, and the f32 operands also overran the attention kernel's
    scoped VMEM at batch 32 (16.01M vs the 16M limit)."""
    cos2 = jnp.repeat(cos, 2, axis=-1).astype(x.dtype)
    sin2 = jnp.repeat(sin, 2, axis=-1).astype(x.dtype)
    return x * cos2 + rotate_half(x) * sin2


# The fused kernel is differentiable through a custom VJP (fused forward,
# reference backward — see pallas_attention.flash_mha), so it is usable in
# training too. Callers gate it per call via the `flash` argument (models
# thread conf.flash down explicitly); `flash=None` falls back to this
# process-level default, which is only ever set before tracing (e.g. by
# benchmark scripts), never mutated at trace time.
_FLASH_DEFAULT: bool = True


def set_flash(enabled: bool):
    """Set the process-level default for the fused Pallas attention kernel
    (used when a call site passes flash=None). Do not call inside traced
    code — pass `flash=` explicitly instead."""
    global _FLASH_DEFAULT
    _FLASH_DEFAULT = enabled


def _use_flash(n: int, d: int, flash: bool | None) -> bool:
    if not (_FLASH_DEFAULT if flash is None else flash):
        return False
    try:
        import jax

        if jax.default_backend() == "cpu":
            return False
        from .pallas_attention import attention_available

        return attention_available(n, d)
    except Exception:
        return False


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_q: jnp.ndarray | None = None,
    mask_k: jnp.ndarray | None = None,
    flash: bool | None = None,
) -> jnp.ndarray:
    """Masked scaled-dot-product attention.

    q: (B, H, M, D), k/v: (B, H, N, D); masks: (B, M) / (B, N) bool, True=valid.
    Returns (B, H, M, D). Fully-masked query rows return zeros.

    On TPU, routes through the fused Pallas kernel (`ops/pallas_attention.py`)
    when `flash` allows it (None = process default) and the problem fits VMEM;
    the jnp path below is the reference semantics.
    """
    if _use_flash(k.shape[2], q.shape[-1], flash):
        from .pallas_attention import flash_mha

        B, N = k.shape[0], k.shape[2]
        mk = mask_k if mask_k is not None else jnp.ones((B, N), bool)
        out = flash_mha(q, k, v, mk)
        if mask_q is not None:
            out = out * mask_q[:, None, :, None]
        return out
    dtype = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bhmd,bhnd->bhmn", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask_k is not None:
        logits = jnp.where(mask_k[:, None, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    if mask_k is not None:
        # guard fully-masked rows (softmax of all -inf)
        any_valid = mask_k.any(axis=-1)[:, None, None, None]
        attn = jnp.where(any_valid, attn, 0.0)
    out = jnp.einsum("bhmn,bhnd->bhmd", attn, v.astype(jnp.float32))
    if mask_q is not None:
        out = out * mask_q[:, None, :, None]
    return out.astype(dtype)


def bidirectional_attention(
    qk0: jnp.ndarray,
    qk1: jnp.ndarray,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
    flash: bool | None = None,
):
    """Shared-QK cross-attention in both directions (reference
    `lightglue.py:195-221`): the similarity matrix qk0 @ qk1^T is used
    row-softmaxed for image0 queries and column-softmaxed for image1 queries.

    qk0: (B, H, M, D), qk1: (B, H, N, D). Returns (m0 (B,H,M,D), m1 (B,H,N,D)).
    """
    if _use_flash(max(qk0.shape[2], qk1.shape[2]), qk0.shape[-1], flash):
        from .pallas_attention import flash_bidirectional

        B, M = qk0.shape[0], qk0.shape[2]
        N = qk1.shape[2]
        m0_ = mask0 if mask0 is not None else jnp.ones((B, M), bool)
        m1_ = mask1 if mask1 is not None else jnp.ones((B, N), bool)
        return flash_bidirectional(qk0, qk1, v0, v1, m0_, m1_)
    dtype = qk0.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(qk0.shape[-1], jnp.float32))
    sim = jnp.einsum("bhmd,bhnd->bhmn", qk0, qk1, preferred_element_type=jnp.float32)
    sim = sim * scale
    if mask1 is not None:
        sim01 = jnp.where(mask1[:, None, None, :], sim, NEG_INF)
    else:
        sim01 = sim
    if mask0 is not None:
        sim10 = jnp.where(mask0[:, None, :, None], sim, NEG_INF)
    else:
        sim10 = sim
    attn01 = jax.nn.softmax(sim01, axis=-1)
    attn10 = jax.nn.softmax(sim10, axis=-2)
    if mask1 is not None:
        attn01 = jnp.where(mask1.any(-1)[:, None, None, None], attn01, 0.0)
    if mask0 is not None:
        attn10 = jnp.where(mask0.any(-1)[:, None, None, None], attn10, 0.0)
    m0 = jnp.einsum("bhmn,bhnd->bhmd", attn01, v1.astype(jnp.float32))
    m1 = jnp.einsum("bhmn,bhmd->bhnd", attn10, v0.astype(jnp.float32))
    if mask0 is not None:
        m0 = m0 * mask0[:, None, :, None]
    if mask1 is not None:
        m1 = m1 * mask1[:, None, :, None]
    return m0.astype(dtype), m1.astype(dtype)
