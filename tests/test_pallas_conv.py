"""Parity tests for the fused VGG-block Pallas kernel (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.ops.pallas_conv import fused_vgg_block, vgg_block_xla


def _mk(rng, *shape):
    return jnp.asarray(rng.normal(0, 0.5, shape), jnp.float32)


def test_fused_vgg_single_conv_pool():
    rng = np.random.default_rng(0)
    x = _mk(rng, 2, 32, 48, 8)
    wa, ba = _mk(rng, 3, 3, 8, 16), _mk(rng, 16)
    out = fused_vgg_block(x, wa, ba, two_convs=False, interpret=True)
    ref = vgg_block_xla(x, wa, ba)
    assert out.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_vgg_two_convs_pool():
    rng = np.random.default_rng(1)
    x = _mk(rng, 1, 32, 32, 8)
    wa, ba = _mk(rng, 3, 3, 8, 16), _mk(rng, 16)
    wb, bb = _mk(rng, 3, 3, 16, 8), _mk(rng, 8)
    out = fused_vgg_block(x, wa, ba, wb, bb, interpret=True)
    ref = vgg_block_xla(x, wa, ba, wb, bb)
    assert out.shape == (1, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_vgg_no_pool():
    rng = np.random.default_rng(2)
    x = _mk(rng, 1, 16, 32, 8)
    wa, ba = _mk(rng, 3, 3, 8, 8), _mk(rng, 8)
    wb, bb = _mk(rng, 3, 3, 8, 8), _mk(rng, 8)
    out = fused_vgg_block(x, wa, ba, wb, bb, pool=False, interpret=True)
    ref = vgg_block_xla(x, wa, ba, wb, bb, pool=False)
    assert out.shape == (1, 16, 32, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_vgg_multi_chunk_bf16():
    """Tall image -> several row chunks; bf16 IO with f32 accumulation must
    match the XLA conv (which also accumulates f32) closely."""
    rng = np.random.default_rng(3)
    x = _mk(rng, 1, 64, 32, 8).astype(jnp.bfloat16)
    wa, ba = _mk(rng, 3, 3, 8, 16).astype(jnp.bfloat16), _mk(rng, 16).astype(jnp.bfloat16)
    wb, bb = _mk(rng, 3, 3, 16, 8).astype(jnp.bfloat16), _mk(rng, 8).astype(jnp.bfloat16)
    out = fused_vgg_block(x, wa, ba, wb, bb, interpret=True)
    ref = vgg_block_xla(x, wa, ba, wb, bb)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.15, rtol=0.1)
