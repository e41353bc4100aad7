"""Assignment heads: dual-softmax, sigmoid-gated double softmax (LightGlue),
log-domain Sinkhorn optimal transport (SuperGlue), and match filtering.

Roles of reference `models/matchers/lightglue.py:256-309`
(`sigmoid_log_double_softmax`, `filter_matches`),
`gluefactory_nonfree/superglue.py:186-214` (`log_optimal_transport`),
`models/matchers/gluestick.py:772-783` (`log_double_softmax`).

All functions are mask-aware: padded keypoints must be provably inert
(SURVEY §7 "hard parts"). Masked entries get -inf scores and matches -1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _mask_sim(sim, mask0, mask1):
    if mask0 is not None:
        sim = jnp.where(mask0[..., :, None], sim, NEG_INF)
    if mask1 is not None:
        sim = jnp.where(mask1[..., None, :], sim, NEG_INF)
    return sim


def masked_log_softmax(x, mask, axis):
    """log_softmax that treats masked entries as absent."""
    if mask is not None:
        x = jnp.where(mask, x, NEG_INF)
    return jax.nn.log_softmax(x, axis=axis)


def sigmoid_log_double_softmax(sim, z0, z1, mask0=None, mask1=None) -> jnp.ndarray:
    """LightGlue assignment: (B, M, N) similarity + per-point matchability
    logits z0 (B, M), z1 (B, N) -> (B, M+1, N+1) log-assignment.

    scores[:M,:N] = log_softmax_rows + log_softmax_cols + logsig(z0) + logsig(z1)
    scores[:, N]  = logsig(-z0);  scores[M, :] = logsig(-z1).
    """
    B, M, N = sim.shape
    certainties = jax.nn.log_sigmoid(z0)[..., :, None] + jax.nn.log_sigmoid(z1)[..., None, :]
    simm = _mask_sim(sim, mask0, mask1)
    scores0 = jax.nn.log_softmax(simm, axis=2)
    scores1 = jax.nn.log_softmax(simm, axis=1)
    inner = scores0 + scores1 + certainties
    if mask0 is not None:
        inner = jnp.where(mask0[..., :, None], inner, NEG_INF)
    if mask1 is not None:
        inner = jnp.where(mask1[..., None, :], inner, NEG_INF)
    scores = jnp.full((B, M + 1, N + 1), NEG_INF, dtype=sim.dtype)
    scores = scores.at[:, :M, :N].set(inner)
    un0 = jax.nn.log_sigmoid(-z0)
    un1 = jax.nn.log_sigmoid(-z1)
    if mask0 is not None:
        un0 = jnp.where(mask0, un0, NEG_INF)
    if mask1 is not None:
        un1 = jnp.where(mask1, un1, NEG_INF)
    scores = scores.at[:, :M, N].set(un0)
    scores = scores.at[:, M, :N].set(un1)
    return scores


def log_double_softmax(sim, bin_score, mask0=None, mask1=None) -> jnp.ndarray:
    """GlueStick/dual-softmax assignment with a learned dustbin score:
    augment sim with a bin row/col, softmax over each axis, average in
    log space (reference `gluestick.py:772-783`)."""
    B, M, N = sim.shape
    sim = _mask_sim(sim, mask0, mask1)
    bin_ = jnp.full((B, 1, 1), bin_score, dtype=sim.dtype)
    sim_row = jnp.concatenate([sim, jnp.broadcast_to(bin_, (B, M, 1))], axis=2)
    sim_col = jnp.concatenate([sim, jnp.broadcast_to(bin_, (B, 1, N))], axis=1)
    scores0 = jax.nn.log_softmax(sim_row, axis=2)  # (B, M, N+1)
    scores1 = jax.nn.log_softmax(sim_col, axis=1)  # (B, M+1, N)
    scores = jnp.full((B, M + 1, N + 1), NEG_INF, dtype=sim.dtype)
    scores = scores.at[:, :M, :N].set((scores0[:, :, :N] + scores1[:, :M, :]) / 2.0)
    scores = scores.at[:, :M, N].set(scores0[:, :, N])
    scores = scores.at[:, M, :N].set(scores1[:, M, :])
    return scores


def log_sinkhorn_iterations(Z, log_mu, log_nu, iters: int) -> jnp.ndarray:
    """Log-domain Sinkhorn normalization (reference `superglue.py:186-199`).

    On TPU, routes through the VMEM-resident Pallas kernel
    (`ops/pallas_sinkhorn.py`) when the coupling matrix fits on chip."""
    try:
        if jax.default_backend() != "cpu":
            from .pallas_sinkhorn import log_sinkhorn_pallas, sinkhorn_available

            if sinkhorn_available(Z.shape[1], Z.shape[2]):
                return log_sinkhorn_pallas(Z, log_mu, log_nu, iters)
    except Exception:
        pass

    def body(_, carry):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores, bin_score, iters: int, mask0=None, mask1=None) -> jnp.ndarray:
    """Differentiable optimal transport with dustbins in log space
    (reference `superglue.py:201-214`).

    scores: (B, M, N); returns (B, M+1, N+1) log assignment, normalized so the
    total mass is 1 (the reference subtracts log(M+N) at the end via norm).
    Mask-aware: padded rows/cols get ~zero mass and transport to the bins.
    """
    B, M, N = scores.shape
    one = jnp.ones((), dtype=scores.dtype)
    ms = (
        mask0.sum(-1).astype(scores.dtype) if mask0 is not None else jnp.full((B,), float(M), scores.dtype)
    )
    ns = (
        mask1.sum(-1).astype(scores.dtype) if mask1 is not None else jnp.full((B,), float(N), scores.dtype)
    )

    scores = _mask_sim(scores, mask0, mask1)
    bins0 = jnp.full((B, M, 1), bin_score, dtype=scores.dtype)
    bins1 = jnp.full((B, 1, N), bin_score, dtype=scores.dtype)
    alpha = jnp.full((B, 1, 1), bin_score, dtype=scores.dtype)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], -1), jnp.concatenate([bins1, alpha], -1)], 1
    )  # (B, M+1, N+1)

    norm = -jnp.log(ms + ns)  # (B,)
    # marginals: each real point has mass 1, bins absorb the rest
    log_mu_pts = jnp.broadcast_to(norm[:, None], (B, M))
    if mask0 is not None:
        log_mu_pts = jnp.where(mask0, log_mu_pts, NEG_INF)
    log_mu = jnp.concatenate([log_mu_pts, (jnp.log(ns) + norm)[:, None]], axis=1)
    log_nu_pts = jnp.broadcast_to(norm[:, None], (B, N))
    if mask1 is not None:
        log_nu_pts = jnp.where(mask1, log_nu_pts, NEG_INF)
    log_nu = jnp.concatenate([log_nu_pts, (jnp.log(ms) + norm)[:, None]], axis=1)

    Z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    return Z - norm[:, None, None]


def filter_matches(scores: jnp.ndarray, th: float, mask0=None, mask1=None):
    """Mutual-nearest + threshold match extraction from an (M+1, N+1) log
    assignment (reference `lightglue.py:293-309`).

    Returns (matches0 (B,M), matches1 (B,N), mscores0 (B,M), mscores1 (B,N)).
    matchesX = index into the other set, -1 if unmatched/invalid.
    """
    inner = scores[:, :-1, :-1]
    B, M, N = inner.shape
    max0 = inner.max(axis=2)
    m0 = inner.argmax(axis=2)
    max1 = inner.max(axis=1)
    m1 = inner.argmax(axis=1)
    ar0 = jnp.arange(M)[None]
    ar1 = jnp.arange(N)[None]
    mutual0 = ar0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = ar1 == jnp.take_along_axis(m0, m1, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > th)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    if mask0 is not None:
        valid0 = valid0 & mask0
        mscores0 = mscores0 * mask0
    if mask1 is not None:
        valid1 = valid1 & mask1
        mscores1 = mscores1 * mask1
    matches0 = jnp.where(valid0, m0, -1)
    matches1 = jnp.where(valid1, m1, -1)
    return matches0.astype(jnp.int32), matches1.astype(jnp.int32), mscores0, mscores1


def find_nn(sim, ratio_th=None, distance_th=None, mask0=None, mask1=None):
    """Nearest-neighbor matching over a cosine-similarity matrix with optional
    Lowe's ratio test and distance threshold (reference
    `models/matchers/nearest_neighbor_matcher.py:38-60`)."""
    sim = _mask_sim(sim, mask0, mask1)
    sim_nn, ind_nn = jax.lax.top_k(sim, 2)
    dist_nn = 2.0 * (1.0 - sim_nn)
    mask = jnp.ones_like(sim_nn[..., 0], dtype=bool)
    if ratio_th is not None:
        mask = mask & (dist_nn[..., 0] <= (ratio_th**2) * dist_nn[..., 1])
    if distance_th is not None:
        mask = mask & (dist_nn[..., 0] <= distance_th**2)
    matches = jnp.where(mask, ind_nn[..., 0], -1)
    scores = jnp.where(mask, (sim_nn[..., 0] + 1) / 2.0, 0.0)
    return matches.astype(jnp.int32), scores


def mutual_check(m0: jnp.ndarray, m1: jnp.ndarray) -> jnp.ndarray:
    """Keep only mutual matches (reference `nearest_neighbor_matcher.py:62-67`)."""
    M = m0.shape[-1]
    inds0 = jnp.arange(M)[None]
    m0_clamped = jnp.clip(m0, 0, m1.shape[-1] - 1)
    loop = jnp.take_along_axis(m1, m0_clamped, axis=-1)
    ok = (m0 >= 0) & (inds0 == loop)
    return jnp.where(ok, m0, -1)
