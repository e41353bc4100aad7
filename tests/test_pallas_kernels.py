"""Parity tests for the Pallas TPU kernels against the jnp reference
implementations, run in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.ops.attention import mha
from gluefactory_tpu.ops.pallas_attention import fused_attention


def test_fused_attention_matches_reference():
    rng = np.random.default_rng(0)
    B, H, M, N, D = 2, 4, 96, 128, 64
    q = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    ref = mha(q, k, v)
    out = fused_attention(q, k, v, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_masked():
    rng = np.random.default_rng(1)
    B, H, M, N, D = 1, 2, 64, 64, 32
    q = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    mask = np.ones((B, N), bool)
    mask[:, 40:] = False
    mask_j = jnp.asarray(mask)
    ref = mha(q, k, v, mask_k=mask_j)
    out = fused_attention(q, k, v, mask_j, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_uneven_m():
    """M not divisible by the q block: padding must be inert."""
    rng = np.random.default_rng(2)
    B, H, M, N, D = 1, 1, 50, 70, 32
    q = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    ref = mha(q, k, v)
    out = fused_attention(q, k, v, block_q=32, interpret=True)
    assert out.shape == (B, H, M, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sinkhorn_kernel_matches_reference():
    from gluefactory_tpu.ops.assignment import log_sinkhorn_iterations
    from gluefactory_tpu.ops.pallas_sinkhorn import log_sinkhorn_pallas

    rng = np.random.default_rng(3)
    B, M, N = 2, 33, 41
    Z = jnp.asarray(rng.normal(size=(B, M, N)), jnp.float32)
    log_mu = jnp.asarray(rng.normal(size=(B, M)), jnp.float32)
    log_nu = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    ref = log_sinkhorn_iterations(Z, log_mu, log_nu, 20)
    out = log_sinkhorn_pallas(Z, log_mu, log_nu, 20, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_flash_mha_gradients_match_reference():
    """custom_vjp: grads through the fused kernel (interpret mode) must match
    grads through the jnp reference."""
    from gluefactory_tpu.ops import pallas_attention as pa

    rng = np.random.default_rng(5)
    B, H, M, N, D = 1, 2, 32, 32, 16
    q = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    mask = jnp.asarray(np.r_[np.ones(24, bool), np.zeros(8, bool)][None])

    # use interpret mode inside the custom_vjp forward
    orig = pa.fused_attention
    pa_fused = lambda q, k, v, m: orig(q, k, v, m, interpret=True)
    pa.fused_attention, saved = pa_fused, orig
    try:
        def loss_flash(q, k, v):
            return (pa.flash_mha(q, k, v, mask) ** 2).sum()

        def loss_ref(q, k, v):
            return (pa._mha_reference(q, k, v, mask) ** 2).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        pa.fused_attention = saved


def test_fused_bidirectional_matches_reference():
    """Bidirectional shared-QK cross-attention kernel vs the jnp path,
    including partial masks, uneven M vs N, and fully-masked sides."""
    from gluefactory_tpu.ops.attention import bidirectional_attention
    from gluefactory_tpu.ops.pallas_attention import fused_bidirectional_attention

    rng = np.random.default_rng(7)
    B, H, M, N, D = 2, 3, 80, 64, 16
    qk0 = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    qk1 = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    cases = [
        (jnp.ones((B, M), bool), jnp.ones((B, N), bool)),
        (
            jnp.asarray(rng.uniform(size=(B, M)) > 0.3),
            jnp.asarray(rng.uniform(size=(B, N)) > 0.3),
        ),
        (jnp.zeros((B, M), bool), jnp.asarray(rng.uniform(size=(B, N)) > 0.3)),
        (jnp.asarray(rng.uniform(size=(B, M)) > 0.3), jnp.zeros((B, N), bool)),
    ]
    for mask0, mask1 in cases:
        r0, r1 = bidirectional_attention(qk0, qk1, v0, v1, mask0, mask1, flash=False)
        o0, o1 = fused_bidirectional_attention(
            qk0, qk1, v0, v1, mask0, mask1, block_q=32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(o0), np.asarray(r0), atol=2e-5)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(r1), atol=2e-5)


def test_flash_bidirectional_gradients_match_reference():
    from gluefactory_tpu.ops import pallas_attention as pa

    rng = np.random.default_rng(8)
    B, H, M, N, D = 1, 2, 32, 48, 16
    qk0 = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    qk1 = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(B, H, M, D)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    mask0 = jnp.asarray(np.r_[np.ones(24, bool), np.zeros(8, bool)][None])
    mask1 = jnp.asarray(np.r_[np.ones(40, bool), np.zeros(8, bool)][None])

    orig = pa.fused_bidirectional_attention
    pa.fused_bidirectional_attention = lambda *a: orig(
        *a, block_q=32, interpret=True
    )
    try:
        def loss_flash(qk0, qk1, v0, v1):
            m0, m1 = pa.flash_bidirectional(qk0, qk1, v0, v1, mask0, mask1)
            return (m0**2).sum() + (m1**2).sum()

        def loss_ref(qk0, qk1, v0, v1):
            m0, m1 = pa._bidir_reference(qk0, qk1, v0, v1, mask0, mask1)
            return (m0**2).sum() + (m1**2).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(qk0, qk1, v0, v1)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qk0, qk1, v0, v1)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        pa.fused_bidirectional_attention = orig
