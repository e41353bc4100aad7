"""int8 quantized convolution path for extraction backbones.

v5e's MXU runs int8 x int8 -> int32 at 394 TOPS — 2x the bf16 peak — and
XLA lowers `conv_general_dilated` with int8 operands and
`preferred_element_type=int32` onto it directly.  This module provides the
building blocks for executing a VGG-style backbone in int8:

  - per-output-channel symmetric weight quantization (computed from the
    live fp32/bf16 params at trace time; loop-invariant, so XLA hoists it
    out of benchmark scan bodies),
  - dynamic per-tensor activation quantization (a global abs-max reduction
    that XLA fuses into the producing epilogue),
  - a fused dequant -> bias -> relu -> requant epilogue between layers, and
  - max-pooling performed in the int8 domain (monotone, scale-preserving —
    pooling 1-byte values halves the pool's HBM traffic vs bf16).

This is a TPU-native serving feature with no counterpart in the reference
(which runs fp32/fp16 CUDA); it exists to push inference throughput past
the bf16 roofline documented in ROADMAP.md.  Accuracy contract: per-channel
weights + per-tensor dynamic activations keep VGG-style backbones within
ordinary 8-bit post-training-quantization error; see
tests/test_int8.py for the end-to-end agreement bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    Returns (w8 int8, s_w fp32 per-out-channel scale)."""
    w = w.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return w8, s_w


def quantize_activation(x: jnp.ndarray):
    """Dynamic per-tensor symmetric int8 quantization.

    Returns (x8 int8, s_x fp32 scalar scale)."""
    s_x = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(
        jnp.int8
    )
    return x8, s_x


def int8_conv(
    x8: jnp.ndarray,  # (B, H, W, Cin) int8
    s_x: jnp.ndarray,  # scalar fp32
    w: jnp.ndarray,  # (kh, kw, Cin, Cout) fp32/bf16 (quantized here)
    b: jnp.ndarray | None,  # (Cout,)
    relu: bool = True,
    requant: bool = True,
):
    """One quantized conv layer: int8 MXU conv + dequant/bias/relu epilogue.

    Returns (y8 int8, s_y) when `requant` else the bf16 activation."""
    w8, s_w = quantize_weight(w)
    acc = jax.lax.conv_general_dilated(
        x8,
        w8,
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * s_w)[None, None, None]
    if b is not None:
        y = y + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if not requant:
        return y.astype(jnp.bfloat16)
    return quantize_activation(y)


def int8_max_pool(x8: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool in the int8 domain (scale-preserving)."""
    return jax.lax.reduce_window(
        x8,
        jnp.int8(-128),
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )
