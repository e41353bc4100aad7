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


def _close_counts(
    segs: jnp.ndarray,  # (B, Ls, 2, 2) candidate segments (their own view)
    pts_w: jnp.ndarray,  # (B, Lp, S, 2) other view's line samples warped here
    valid_w: jnp.ndarray,  # (B, Lp, S) validity/visibility of each sample
    perp_dist_th: float,
):
    """counts[b, ls, lp] = number of valid warped samples of line lp within
    perp_dist_th of segment ls AND whose perpendicular foot lies inside the
    segment (reference `torch_perp_dist` + close_points sum,
    gt_generation.py:173-205,308-322)."""
    dist, in_seg = point_line_distances(pts_w, segs)  # (B, Lp, S, Ls)
    close = (dist < perp_dist_th) & in_seg & valid_w[..., None]
    return jnp.swapaxes(close.sum(axis=2), 1, 2)  # (B, Ls, Lp)


def _clamp_lines(lines: jnp.ndarray, shape) -> jnp.ndarray:
    """Clamp segment endpoints to [0, w-1] x [0, h-1] (reference
    gt_generation.py:252-260,466-473)."""
    h, w = shape
    hi = jnp.asarray([w - 1.0, h - 1.0], lines.dtype)
    return jnp.clip(lines, 0.0, hi)


def _out_of_fraction(pts_w: jnp.ndarray, shape, min_visibility_th: float):
    """(B, L, S, 2) warped samples -> (B, L) bool: True when the fraction of
    samples outside [0, w) x [0, h) reaches 1 - min_visibility_th
    (reference gt_generation.py:291-303)."""
    h, w = shape
    wh = jnp.asarray([w, h], pts_w.dtype)
    out = (pts_w < 0).any(-1) | (pts_w >= wh).any(-1)
    return out.mean(axis=-1) >= (1.0 - min_visibility_th)


def _line_gt_labels(
    c10, c01, mask_close, unmatched0, unmatched1, ignore0, ignore1, npts: int
):
    """Shared reference labeling (gt_generation.py:354-407,505-556):
    Hungarian on -count-product over the full matrix (here: batched auction
    maximizing the normalized product — eps-optimal, agreement vs scipy
    measured in tests/test_gt_lines_lap.py), then positives filtered by
    mask_close and the unmatched/ignore row/col labels."""
    B, L0, L1 = c10.shape
    score = (c10 * c01).astype(jnp.float32) / float(npts * npts)
    forbid = (unmatched0 | ignore0)[:, :, None] | (unmatched1 | ignore1)[:, None, :]
    masked = jnp.where(forbid, -jnp.inf, score)
    m0a, m1a = auction_assignment(masked, min_score=-jnp.inf, eps=1e-3)
    assigned0 = m0a >= 0
    positive = (
        (m0a[:, :, None] == jnp.arange(L1)[None, None, :])
        & assigned0[:, :, None]
        & mask_close
        & ~(unmatched0 | ignore0)[:, :, None]
        & ~(unmatched1 | ignore1)[:, None, :]
    )
    pos0 = positive.any(-1)
    pos1 = positive.any(-2)
    m0 = jnp.where(pos0, m0a, UNMATCHED)
    m0 = jnp.where(unmatched0, UNMATCHED, m0)
    m0 = jnp.where(ignore0, IGNORE, m0).astype(jnp.int32)
    m1 = jnp.where(pos1, m1a, UNMATCHED)
    m1 = jnp.where(unmatched1, UNMATCHED, m1)
    m1 = jnp.where(ignore1, IGNORE, m1).astype(jnp.int32)
    return {"matches0": m0, "matches1": m1, "assignment": positive}


def gt_line_matches_from_homography(
    lines0, lines1, lmask0, lmask1, shape0, shape1, H,
    n_samples: int = 50, perp_dist_th: float = 5.0, overlap_th: float = 0.2,
    min_visibility_th: float = 0.5,
):
    """Reference `gt_line_matches_from_homography` (gt_generation.py:410-558)
    exactly: endpoints clamped to the image, samples warped both ways,
    close-sample counts with strict `> npts * overlap_th` thresholds both
    ways, mostly-out-of-image lines UNMATCHED, assignment maximizing the
    count product, invalid (masked) lines IGNORE.

    lines (B, L, 2, 2) xy, masks (B, L) (reference `valid_lines`),
    shape0/shape1 static (h, w), H (B, 3, 3).
    """
    B, L0 = lines0.shape[:2]
    lines0 = _clamp_lines(lines0, shape0)
    lines1 = _clamp_lines(lines1, shape1)
    s0 = sample_points_on_lines(lines0, n_samples)  # (B, L0, S, 2)
    s1 = sample_points_on_lines(lines1, n_samples)
    s0_w = warp_points(s0.reshape(B, -1, 2), H).reshape(s0.shape)
    s1_w = warp_points(s1.reshape(B, -1, 2), H, inverse=True).reshape(s1.shape)
    out_of0 = _out_of_fraction(s1_w, shape0, min_visibility_th)  # (B, L1)
    out_of1 = _out_of_fraction(s0_w, shape1, min_visibility_th)  # (B, L0)
    ones0 = jnp.ones(s0.shape[:3], bool)
    ones1 = jnp.ones(s1.shape[:3], bool)
    c10 = _close_counts(lines0, s1_w, ones1, perp_dist_th)  # (B, L0, L1)
    c01 = jnp.swapaxes(
        _close_counts(lines1, s0_w, ones0, perp_dist_th), 1, 2
    )  # (B, L0, L1)
    th = n_samples * overlap_th
    mask_close = (
        (c01 > th)
        & (c10 > th)
        & ~out_of0[:, None, :]
        & ~out_of1[:, :, None]
    )
    unmatched0 = jnp.all(~mask_close, axis=2) | out_of1
    unmatched1 = jnp.all(~mask_close, axis=1) | out_of0
    ignore0 = ~lmask0
    ignore1 = ~lmask1
    return _line_gt_labels(
        c10, c01, mask_close, unmatched0, unmatched1, ignore0, ignore1, n_samples
    )


def gt_line_matches_from_pose_depth(
    lines0, lines1, lmask0, lmask1,
    camera0: Camera, camera1: Camera, T_0to1: Pose, depth0, depth1,
    shape0=None, shape1=None,
    n_samples: int = 50, perp_dist_th: float = 5.0, overlap_th: float = 0.2,
    min_visibility_th: float = 0.5,
):
    """Reference `gt_line_matches_from_pose_depth` (gt_generation.py:208-407)
    exactly: depth-sampled line points projected both ways, close counts
    weighted by projection visibility, strict `> n_visible * overlap_th`
    thresholds, low-valid-depth lines IGNORE, mostly-out-of-image lines
    UNMATCHED, count-product assignment.

    shape0/shape1 default to the depth map shapes (the reference clamps to
    the depth shape and bounds-checks against the image shape — identical in
    every dataset here)."""
    B, L0 = lines0.shape[:2]
    L1 = lines1.shape[1]
    if shape0 is None:
        shape0 = depth0.shape[-2:]
    if shape1 is None:
        shape1 = depth1.shape[-2:]
    lines0 = _clamp_lines(lines0, shape0)
    lines1 = _clamp_lines(lines1, shape1)
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
    out_of0 = _out_of_fraction(s1_w, shape0, min_visibility_th)  # (B, L1)
    out_of1 = _out_of_fraction(s0_w, shape1, min_visibility_th)  # (B, L0)
    c10 = _close_counts(lines0, s1_w, vw1, perp_dist_th)  # (B, L0, L1)
    c01 = jnp.swapaxes(
        _close_counts(lines1, s0_w, vw0, perp_dist_th), 1, 2
    )  # (B, L0, L1)
    nvis0 = vw0.sum(-1).astype(jnp.float32)  # (B, L0)
    nvis1 = vw1.sum(-1).astype(jnp.float32)  # (B, L1)
    mask_close = (c01 > nvis0[:, :, None] * overlap_th) & (
        c10 > nvis1[:, None, :] * overlap_th
    )
    unmatched0 = jnp.all(~mask_close, axis=2) | out_of1
    unmatched1 = jnp.all(~mask_close, axis=1) | out_of0
    # lines with too few valid-depth samples are uncertain -> IGNORE
    frac_valid0 = v0.reshape(B, L0, n_samples).mean(-1)
    frac_valid1 = v1.reshape(B, L1, n_samples).mean(-1)
    ignore0 = (frac_valid0 < min_visibility_th) | ~lmask0
    ignore1 = (frac_valid1 < min_visibility_th) | ~lmask1
    return _line_gt_labels(
        c10, c01, mask_close, unmatched0, unmatched1, ignore0, ignore1, n_samples
    )
