"""Ground-truth line matching for supervision (role of reference
`geometry/gt_generation.py:165-558` line paths).

Strategy (behavioral spec from the reference): sample points along each line,
warp/project them into the other view, measure perpendicular distance to the
candidate line, count overlapping samples both ways -> an overlap score
matrix; then solve a linear assignment on the overlap matrix.

TPU-first: the reference calls scipy's Hungarian (CPU,
`gt_generation.py:367,515`) inside the training supervision path; here a
batched GREEDY assignment runs on device (`lax.scan` picking the global max
and masking its row/column) — exact when scores are well separated, which
overlap matrices are, and fully jit/batch-parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .depth import project, sample_depth
from .homography import warp_points
from .wrappers import Camera, Pose

IGNORE = -2
UNMATCHED = -1


def greedy_assignment(scores: jnp.ndarray, min_score: float):
    """Batched greedy LAP: iteratively take the global max of (B, M, N),
    assign, mask row+col. Returns (matches0 (B,M), matches1 (B,N)) with
    UNMATCHED where score < min_score."""
    B, M, N = scores.shape

    def step(state, _):
        s, m0, m1 = state
        flat = s.reshape(B, M * N)
        idx = jnp.argmax(flat, axis=-1)
        val = jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0]
        i = idx // N
        j = idx % N
        ok = val >= min_score
        m0 = jnp.where(
            ok[:, None] & (jnp.arange(M)[None] == i[:, None]), j[:, None], m0
        )
        m1 = jnp.where(
            ok[:, None] & (jnp.arange(N)[None] == j[:, None]), i[:, None], m1
        )
        # mask row i and column j
        row_mask = jnp.arange(M)[None] == i[:, None]
        col_mask = jnp.arange(N)[None] == j[:, None]
        s = jnp.where(ok[:, None, None] & (row_mask[:, :, None] | col_mask[:, None, :]), -jnp.inf, s)
        return (s, m0, m1), None

    m0 = jnp.full((B, M), UNMATCHED, jnp.int32)
    m1 = jnp.full((B, N), UNMATCHED, jnp.int32)
    (s, m0, m1), _ = jax.lax.scan(step, (scores, m0, m1), None, length=min(M, N))
    return m0, m1


def auction_assignment(
    scores: jnp.ndarray,
    min_score: float,
    eps: float = 5e-3,
    max_iters: int = 1000,
    outside_option: float = 0.0,
):
    """Batched auction algorithm (Bertsekas) maximizing total score — the
    on-device replacement for the reference's scipy Hungarian
    (`gt_generation.py:367,515`). Each assigned row's column is within
    `eps` of its best value at the equilibrium prices, so the assignment
    value is within M*eps of optimal; at eps=5e-3 on [0, 1] overlap
    fractions this is tie-level accuracy.

    Matching the reference's semantics, the assignment is solved on the
    FULL matrix — rows bid while their best value exceeds `outside_option`
    (0 for non-negative overlap scores), and `min_score` only thresholds
    matched pairs at the end. Bidding down to the outside option (not to
    min_score) is what lets value-improving chains through sub-threshold
    pairs resolve the same way Hungarian does.

    scores (B, M, N) with -inf for forbidden pairs. Jacobi bidding inside
    `lax.while_loop`; every iteration is a (B, M, N) max — cheap at line
    counts (M, N <= a few hundred).
    """
    B, M, N = scores.shape
    neg = -jnp.inf
    lam = outside_option

    def cond(state):
        prices, owner_row, assigned_col, it = state
        # rows still wanting to bid: unassigned and best value >= lam
        values = scores - prices[:, None, :]
        best = values.max(-1)
        want = (assigned_col == UNMATCHED) & (best >= lam)
        return (it < max_iters) & want.any()

    def body(state):
        prices, owner_row, assigned_col, it = state
        values = scores - prices[:, None, :]  # (B, M, N)
        v1 = values.max(-1)
        j_star = values.argmax(-1)
        # second-best value (for the bid increment)
        masked = jnp.where(
            jax.nn.one_hot(j_star, N, dtype=bool), neg, values
        )
        v2 = masked.max(-1)
        v2 = jnp.where(jnp.isfinite(v2), v2, lam)
        bidding = (assigned_col == UNMATCHED) & (v1 >= lam)
        bid = v1 - jnp.maximum(v2, lam) + eps  # price increment
        # column-wise: highest bidder among bidding rows
        bid_matrix = jnp.where(
            bidding[:, :, None] & jax.nn.one_hot(j_star, N, dtype=bool),
            bid[:, :, None],
            neg,
        )  # (B, M, N)
        top_bid = bid_matrix.max(1)  # (B, N)
        top_row = bid_matrix.argmax(1).astype(jnp.int32)
        won = top_bid > neg
        # dethrone previous owners of contested columns
        prev = jnp.where(won, owner_row, -1)  # rows losing their column
        lost = (
            (assigned_col[:, :, None] == jnp.arange(N)[None, None, :])
            & won[:, None, :]
            & (jnp.arange(M)[None, :, None] != top_row[:, None, :])
        ).any(-1)
        assigned_col = jnp.where(lost, UNMATCHED, assigned_col)
        owner_row = jnp.where(won, top_row, owner_row)
        prices = jnp.where(won, prices + top_bid, prices)
        # award contested columns to their winners
        new_col = jnp.where(
            won[:, None, :]
            & (jnp.arange(M)[None, :, None] == top_row[:, None, :]),
            jnp.arange(N)[None, None, :],
            -1,
        ).max(-1)
        assigned_col = jnp.where(new_col >= 0, new_col, assigned_col)
        return prices, owner_row, assigned_col, it + 1

    prices = jnp.zeros((B, N), scores.dtype)
    owner_row = jnp.full((B, N), UNMATCHED, jnp.int32)
    assigned_col = jnp.full((B, M), UNMATCHED, jnp.int32)
    prices, owner_row, assigned_col, _ = jax.lax.while_loop(
        cond, body, (prices, owner_row, assigned_col, jnp.asarray(0))
    )
    # threshold: matched pairs must meet min_score (reference semantics)
    pair_score = jnp.take_along_axis(
        scores, jnp.maximum(assigned_col, 0)[:, :, None], axis=-1
    )[:, :, 0]
    m0 = jnp.where(
        (assigned_col >= 0) & (pair_score >= min_score), assigned_col, UNMATCHED
    ).astype(jnp.int32)
    m1 = jnp.full((B, N), UNMATCHED, jnp.int32)
    valid = m0 >= 0
    m1 = jnp.where(
        (jnp.arange(N)[None, None, :] == m0[:, :, None]) & valid[:, :, None],
        jnp.arange(M, dtype=jnp.int32)[None, :, None],
        -1,
    ).max(1)
    m1 = jnp.where(m1 >= 0, m1, UNMATCHED).astype(jnp.int32)
    return m0, m1


def sample_points_on_lines(lines: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """(B, L, 2, 2) -> (B, L, S, 2) uniformly spaced samples per segment."""
    t = jnp.linspace(0.0, 1.0, n_samples)[None, None, :, None]
    p0 = lines[:, :, 0][:, :, None, :]
    p1 = lines[:, :, 1][:, :, None, :]
    return p0 * (1 - t) + p1 * t


def point_line_distances(points: jnp.ndarray, lines: jnp.ndarray):
    """Perpendicular distance of (B, L0, S, 2) points to (B, L1, 2, 2)
    segments: returns (B, L0, S, L1) distance and (B, L0, S, L1) in-segment
    projection mask."""
    a = lines[:, None, None, :, 0]  # (B,1,1,L1,2)
    b = lines[:, None, None, :, 1]
    p = points[:, :, :, None, :]  # (B,L0,S,1,2)
    ab = b - a
    ap = p - a
    len2 = (ab**2).sum(-1)
    t = (ap * ab).sum(-1) / jnp.maximum(len2, 1e-8)
    in_seg = (t >= 0.0) & (t <= 1.0)
    proj = a + t[..., None] * ab
    dist = jnp.linalg.norm(p - proj, axis=-1)
    return dist, in_seg


def _overlap_matrix(
    lines0_w: jnp.ndarray,  # samples of lines0 warped into view1: (B, L0, S, 2)
    valid_w: jnp.ndarray,  # (B, L0, S)
    lines1: jnp.ndarray,  # (B, L1, 2, 2)
    perp_dist_th: float,
):
    dist, in_seg = point_line_distances(lines0_w, lines1)
    close = (dist < perp_dist_th) & in_seg & valid_w[..., None]
    return close.mean(axis=2)  # (B, L0, L1) fraction of samples overlapping


def _line_gt_from_overlaps(
    overlap0, overlap1, lmask0, lmask1, overlap_th: float, min_visibility_th: float,
    visibility0, visibility1,
):
    """Symmetrize overlaps, solve the assignment, label UNMATCHED/IGNORE.

    Uses the batched auction solver (eps-optimal, matching the reference's
    Hungarian within ties — measured in tests/test_gt_lines_lap.py; the
    greedy solver above disagrees with Hungarian on ~7% of rows on
    realistic overlap matrices)."""
    overlaps = jnp.minimum(overlap0, jnp.swapaxes(overlap1, 1, 2))
    neg_inf = -jnp.inf
    masked = jnp.where(lmask0[:, :, None] & lmask1[:, None, :], overlaps, neg_inf)
    m0, m1 = auction_assignment(masked, overlap_th)
    B, L0, L1 = overlaps.shape
    # low-visibility lines (few valid warped samples) are uncertain -> IGNORE
    ignore0 = (visibility0 < min_visibility_th) & (m0 == UNMATCHED)
    ignore1 = (visibility1 < min_visibility_th) & (m1 == UNMATCHED)
    m0 = jnp.where(ignore0, IGNORE, m0)
    m1 = jnp.where(ignore1, IGNORE, m1)
    m0 = jnp.where(lmask0, m0, IGNORE)
    m1 = jnp.where(lmask1, m1, IGNORE)
    assignment = (
        (m0[:, :, None] == jnp.arange(L1)[None, None, :]) & (m0[:, :, None] >= 0)
    )
    return {"matches0": m0, "matches1": m1, "assignment": assignment}


def gt_line_matches_from_homography(
    lines0, lines1, lmask0, lmask1, H,
    n_samples: int = 50, perp_dist_th: float = 5.0, overlap_th: float = 0.2,
    min_visibility_th: float = 0.5,
):
    """lines (B, L, 2, 2), masks (B, L), H (B, 3, 3)."""
    B, L0 = lines0.shape[:2]
    s0 = sample_points_on_lines(lines0, n_samples)  # (B, L0, S, 2)
    s1 = sample_points_on_lines(lines1, n_samples)
    s0_w = warp_points(s0.reshape(B, -1, 2), H).reshape(s0.shape)
    s1_w = warp_points(s1.reshape(B, -1, 2), H, inverse=True).reshape(s1.shape)
    valid0 = jnp.ones(s0.shape[:3], bool)
    valid1 = jnp.ones(s1.shape[:3], bool)
    ov0 = _overlap_matrix(s0_w, valid0, lines1, perp_dist_th)  # (B, L0, L1)
    ov1 = _overlap_matrix(s1_w, valid1, lines0, perp_dist_th)  # (B, L1, L0)
    vis0 = valid0.mean(-1)
    vis1 = valid1.mean(-1)
    return _line_gt_from_overlaps(
        ov0, ov1, lmask0, lmask1, overlap_th, min_visibility_th, vis0, vis1
    )


def gt_line_matches_from_pose_depth(
    lines0, lines1, lmask0, lmask1,
    camera0: Camera, camera1: Camera, T_0to1: Pose, depth0, depth1,
    n_samples: int = 50, perp_dist_th: float = 5.0, overlap_th: float = 0.2,
    min_visibility_th: float = 0.5,
):
    B, L0 = lines0.shape[:2]
    L1 = lines1.shape[1]
    s0 = sample_points_on_lines(lines0, n_samples).reshape(B, L0 * n_samples, 2)
    s1 = sample_points_on_lines(lines1, n_samples).reshape(B, L1 * n_samples, 2)
    d0, v0 = sample_depth(s0, depth0)
    d1, v1 = sample_depth(s1, depth1)
    s0_w, vw0 = project(s0, d0, depth1, camera0, camera1, T_0to1, v0)
    s1_w, vw1 = project(s1, d1, depth0, camera1, camera0, T_0to1.inv(), v1)
    s0_w = s0_w.reshape(B, L0, n_samples, 2)
    s1_w = s1_w.reshape(B, L1, n_samples, 2)
    vw0 = vw0.reshape(B, L0, n_samples)
    vw1 = vw1.reshape(B, L1, n_samples)
    ov0 = _overlap_matrix(s0_w, vw0, lines1, perp_dist_th)
    ov1 = _overlap_matrix(s1_w, vw1, lines0, perp_dist_th)
    vis0 = vw0.mean(-1)
    vis1 = vw1.mean(-1)
    return _line_gt_from_overlaps(
        ov0, ov1, lmask0, lmask1, overlap_th, min_visibility_th, vis0, vis1
    )
