"""Space-to-depth execution of SuperPoint's first VGG block.

Motivation (round-1 profile, v5e, 1024^2 bf16): block1 (conv1a 1->64,
conv1b 64->64, 2x2 pool) is ~62% of the dense extractor pass; conv1a runs at
1.6 TFLOP/s because C_in=1 starves the MXU's K dimension, conv1b reaches
~30% MXU at stride 1, and pool1 is ~5x off speed-of-light as a separate
reduce_window sweep.

This module computes the WHOLE block at half resolution with no
depth-to-space (the transpose that ate the gain in the round-1 standalone
space-to-depth experiment, ROADMAP round-1 log):

  - the input is space-to-depth'd once: (B, H, W, C) -> (B, H/2, W/2, 4C)
    with phase-major channels [q=(0,0), (0,1), (1,0), (1,1)];
  - a full-resolution SAME 3x3 conv restricted to outputs of phase
    (py, px) becomes a 2x2 conv over the phase tensor with phase-dependent
    asymmetric padding (`phase_conv`): K grows from 9*C to 16*C (16/9 more
    MACs, zeros included) but feeds the MXU 4C-deep;
  - the 2x2/2 max-pool is a free elementwise max over the 4 phase outputs.

Arithmetic is exact (same taps, same adds) up to float reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major [(0,0),(0,1),(1,0),(1,1)]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def _phase_kernel(w3: jnp.ndarray, py: int, px: int) -> jnp.ndarray:
    """Scatter a full-res 3x3 kernel (3, 3, Cin, Cout) into the equivalent
    2x2 phase-tensor kernel (2, 2, 4*Cin, Cout) for output phase (py, px).

    With row padding (1-py, py), s2d kernel row u corresponds to s2d row
    offset u - (1 - py); a tap lands at full-res dy = 2*(offset) + qy - py.
    Valid dy in {-1, 0, 1} selects which (u, qy) pairs carry weight.
    """
    Cin, Cout = w3.shape[2], w3.shape[3]
    w = jnp.zeros((2, 2, 4 * Cin, Cout), w3.dtype)
    for u in range(2):
        off_y = u - (1 - py)
        for qy in range(2):
            dy = 2 * off_y + qy - py
            if dy < -1 or dy > 1:
                continue
            for v in range(2):
                off_x = v - (1 - px)
                for qx in range(2):
                    dx = 2 * off_x + qx - px
                    if dx < -1 or dx > 1:
                        continue
                    q = qy * 2 + qx
                    w = w.at[u, v, q * Cin : (q + 1) * Cin, :].set(
                        w3[dy + 1, dx + 1]
                    )
    return w


def phase_conv(
    s2d: jnp.ndarray, w3: jnp.ndarray, bias: jnp.ndarray | None, py: int, px: int
) -> jnp.ndarray:
    """Outputs of a full-res SAME 3x3 conv restricted to phase (py, px),
    computed on the phase tensor. s2d (B, H2, W2, 4*Cin) -> (B, H2, W2, Cout)."""
    wq = _phase_kernel(w3, py, px)
    out = jax.lax.conv_general_dilated(
        s2d,
        wq,
        window_strides=(1, 1),
        padding=((1 - py, py), (1 - px, px)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(s2d.dtype)


def vgg_block1_s2d(
    x: jnp.ndarray,
    wa: jnp.ndarray,
    ba: jnp.ndarray,
    wb: jnp.ndarray,
    bb: jnp.ndarray,
) -> jnp.ndarray:
    """pool2x2(relu(conv3x3_b(relu(conv3x3_a(x))))) at half resolution.

    x (B, H, W, C0) with H, W even; wa (3, 3, C0, C), wb (3, 3, C, C).
    Returns (B, H/2, W/2, C) — exactly the reference block1 output.
    """
    s0 = space_to_depth(x)
    acts = [
        jax.nn.relu(phase_conv(s0, wa, ba, py, px))
        for py in range(2)
        for px in range(2)
    ]
    s1 = jnp.concatenate(acts, axis=-1)  # phase-major stacking
    outs = [
        jax.nn.relu(phase_conv(s1, wb, bb, py, px))
        for py in range(2)
        for px in range(2)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = jnp.maximum(out, o)
    return out
