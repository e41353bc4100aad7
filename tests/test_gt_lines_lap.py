"""Quantify the on-device assignment solvers against scipy's Hungarian (the
reference uses `scipy.optimize.linear_sum_assignment`,
`geometry/gt_generation.py:367,515`) on realistic overlap matrices:
sparse (few candidate pairs per line), quantized scores (overlap counts are
multiples of 1/n_samples, so exact ties are common), plus dense noisy ones.

Measured round 2 (seeds below): GREEDY disagrees with Hungarian on ~7% of
rows (mean value gap 0.23/matrix) on the sparse quantized family — that is
why `_line_gt_from_overlaps` uses the AUCTION solver, which is eps-optimal
(<= M*eps value gap) and agrees with Hungarian up to ties.
"""

import pytest
import numpy as np
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from gluefactory_tpu.geometry.gt_lines import (
    UNMATCHED,
    auction_assignment,
    greedy_assignment,
)


def hungarian_matches(scores: np.ndarray, min_score: float) -> np.ndarray:
    """Reference-style assignment: maximize total score, then threshold."""
    M, N = scores.shape
    finite = np.where(np.isfinite(scores), scores, -1e9)
    ri, ci = linear_sum_assignment(finite, maximize=True)
    m0 = np.full(M, UNMATCHED, np.int64)
    for i, j in zip(ri, ci):
        if scores[i, j] >= min_score:
            m0[i] = j
    return m0


def overlap_like_matrix(rng, M, N, n_samples=50, candidates=2, tie_frac=0.5):
    """Sparse matrix of quantized overlap fractions: each row gets up to
    `candidates` non-zero entries, values k/n_samples (ties abundant)."""
    s = np.zeros((M, N), np.float32)
    for i in range(M):
        for j in rng.choice(N, size=rng.integers(0, candidates + 1), replace=False):
            k = rng.integers(5, n_samples + 1)
            if rng.uniform() < tie_frac:
                k = (k // 5) * 5  # coarser quantization -> more exact ties
            s[i, j] = k / n_samples
    return s


def solver_stats(matrices, min_score, solver):
    total, agree, value_gap, max_gap = 0, 0, 0.0, 0.0
    for s in matrices:
        mine = np.asarray(solver(jnp.asarray(s[None]), min_score)[0])[0]
        hung = hungarian_matches(s, min_score)
        total += len(mine)
        agree += (mine == hung).sum()

        def total_score(m):
            return sum(s[i, j] for i, j in enumerate(m) if j >= 0)

        gap = total_score(hung) - total_score(mine)
        value_gap += gap
        max_gap = max(max_gap, gap)
    return agree / total, value_gap / len(matrices), max_gap


@pytest.mark.slow
def test_auction_matches_hungarian_on_overlap_matrices():
    rng = np.random.default_rng(0)
    mats = [overlap_like_matrix(rng, 24, 28) for _ in range(50)]
    rate, gap, max_gap = solver_stats(mats, 0.2, auction_assignment)
    # eps-optimal: any residual disagreement is a tie permutation within
    # M*eps = 24 * 5e-3 = 0.12 of the optimal total
    assert gap <= 0.12 + 1e-6, f"mean value gap {gap:.4f}"
    assert max_gap <= 0.12 + 1e-6, f"max value gap {max_gap:.4f}"
    assert rate > 0.95, f"agreement {rate:.3f}"


@pytest.mark.slow
def test_auction_matches_hungarian_dense_noisy():
    rng = np.random.default_rng(1)
    mats = [rng.uniform(0, 1, (16, 16)).astype(np.float32) for _ in range(30)]
    rate, gap, max_gap = solver_stats(mats, 0.05, auction_assignment)
    assert max_gap <= 16 * 5e-3 + 1e-6, f"max value gap {max_gap:.4f}"


def test_greedy_gap_documented():
    """Greedy is kept for comparison; this pins its measured suboptimality
    so a regression in either solver is visible."""
    rng = np.random.default_rng(0)
    mats = [overlap_like_matrix(rng, 24, 28) for _ in range(50)]
    rate, gap, _ = solver_stats(mats, 0.2, greedy_assignment)
    assert 0.85 < rate < 1.0
    assert gap < 0.5  # measured 0.23: real but bounded suboptimality


def test_auction_is_exact_on_separated_scores():
    rng = np.random.default_rng(2)
    for _ in range(20):
        M = 12
        perm = rng.permutation(M)
        s = np.full((M, M), 0.01, np.float32)
        s[np.arange(M), perm] = rng.uniform(0.5, 1.0, M)
        out = np.asarray(auction_assignment(jnp.asarray(s[None]), 0.2)[0])[0]
        assert (out == perm).all()


def test_auction_respects_masks_and_threshold():
    s = np.full((1, 4, 5), -np.inf, np.float32)
    s[0, 0, 1] = 0.9
    s[0, 1, 1] = 0.8  # conflicts with row 0
    s[0, 1, 2] = 0.5
    s[0, 2, 3] = 0.1  # below threshold
    m0, m1 = auction_assignment(jnp.asarray(s), 0.2)
    m0 = np.asarray(m0)[0]
    assert m0[0] == 1 and m0[1] == 2
    assert m0[2] == UNMATCHED and m0[3] == UNMATCHED
    m1 = np.asarray(m1)[0]
    assert m1[1] == 0 and m1[2] == 1 and m1[0] == UNMATCHED
