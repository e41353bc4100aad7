"""Batched XLA RANSAC: homography (4-pt DLT) and essential matrix (8-pt).

TPU-native replacement for the reference's per-pair CPU C++ RANSAC backends
(SURVEY §2.9: OpenCV/PoseLib/pycolmap wrappers). All hypotheses are generated
and scored as ONE batched computation — thousands of minimal samples scored
in parallel on the MXU/VPU instead of a sequential CPU loop. Fixed shapes +
validity masks; jit-safe; vmap-able over pairs.

Local optimization: one weighted least-squares refit on the best hypothesis's
inliers (the LO step of LO-RANSAC, which the reference gets from PoseLib).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.homography import compute_homography_dlt
from ..geometry.utils import to_homogeneous


def _sample_minimal_sets(rng, n_iters: int, sample_size: int, n: int, valid):
    """(n_iters, sample_size) indices drawn from valid entries (with repl.
    across iterations, Gumbel top-k without replacement within a set)."""
    logits = jnp.where(valid, 0.0, -jnp.inf)[None, :]  # (1, N)
    g = jax.random.gumbel(rng, (n_iters, valid.shape[0]))
    scores = logits + g
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx


def _homography_residuals(H, pts0, pts1):
    """Symmetric transfer error per point for a single H: (N,)."""
    from ..geometry.homography import warp_points

    fwd = warp_points(pts0[None], H[None])[0]
    bwd = warp_points(pts1[None], H[None], inverse=True)[0]
    e0 = jnp.sum((fwd - pts1) ** 2, -1)
    e1 = jnp.sum((bwd - pts0) ** 2, -1)
    return 0.5 * (e0 + e1)


@partial(jax.jit, static_argnames=("n_iters",))
def ransac_homography(pts0, pts1, valid, th: float, rng, n_iters: int = 1024):
    """pts0/pts1 (N, 2), valid (N,) bool mask. Returns dict with
    H (3,3), inliers (N,), num_inliers, success."""
    n = pts0.shape[0]
    idx = _sample_minimal_sets(rng, n_iters, 4, n, valid)  # (I, 4)
    s0 = pts0[idx]  # (I, 4, 2)
    s1 = pts1[idx]
    H_hyp = compute_homography_dlt(s0, s1)  # (I, 3, 3)

    res = jax.vmap(_homography_residuals, in_axes=(0, None, None))(H_hyp, pts0, pts1)
    th2 = th * th
    inl = (res < th2) & valid[None, :]
    # guard degenerate hypotheses
    finite = jnp.isfinite(H_hyp).all(axis=(-1, -2))
    counts = jnp.where(finite, inl.sum(-1), -1)
    best = jnp.argmax(counts)
    H_best = H_hyp[best]
    inliers = inl[best]

    # local optimization: weighted DLT refit on inliers (2 rounds)
    def refit(H, _):
        w = ((_homography_residuals(H, pts0, pts1) < th2) & valid).astype(jnp.float32)
        H_new = compute_homography_dlt(pts0[None], pts1[None], w[None])[0]
        ok = jnp.isfinite(H_new).all() & (w.sum() >= 4)
        return jnp.where(ok, H_new, H), None

    H_best, _ = jax.lax.scan(refit, H_best, None, length=2)
    inliers = (_homography_residuals(H_best, pts0, pts1) < th2) & valid
    num = inliers.sum()
    return {
        "M_0to1": H_best,
        "inliers": inliers,
        "num_inliers": num,
        "success": num >= 4,
    }


# ---------------------------------------------------------------------------
# Essential matrix (8-point) RANSAC
# ---------------------------------------------------------------------------


def _essential_8pt(p0, p1):
    """Batched 8-point essential from normalized coords: (..., 8, 2) x2 ->
    (..., 3, 3), projected onto the essential manifold."""
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    ones = jnp.ones_like(x0)
    # rows of the epipolar constraint x1^T E x0 = 0
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )  # (..., 8, 9)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    e = vecs[..., :, 0]
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project onto essential manifold: singular values (1, 1, 0)
    U, s, Vt = jnp.linalg.svd(E)
    S = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return U @ S @ Vt


def _epipolar_residuals(E, p0, p1):
    """Squared symmetric epipolar distance (Sampson-like) per point: (N,)."""
    p0h = to_homogeneous(p0)
    p1h = to_homogeneous(p1)
    Ep0 = p0h @ E.T  # (N, 3)
    Etp1 = p1h @ E  # (N, 3)
    num = jnp.sum(p1h * Ep0, axis=-1) ** 2
    d = num * (
        1.0 / (Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + 1e-15)
        + 1.0 / (Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2 + 1e-15)
    )
    return d


def _triangulate_depths(R, t, p0, p1):
    """Mid-point depths of points for cheirality checks. Returns (z0, z1)."""
    # rays
    r0 = to_homogeneous(p0)  # in cam0
    r1 = to_homogeneous(p1)  # in cam1
    # solve for depths: z1 * r1 = R (z0 * r0) + t  (least squares per point)
    Rr0 = r0 @ R.T  # (N, 3)
    # [Rr0, -r1] [z0, z1]^T = -t
    a11 = jnp.sum(Rr0 * Rr0, -1)
    a12 = -jnp.sum(Rr0 * r1, -1)
    a22 = jnp.sum(r1 * r1, -1)
    b1 = -jnp.sum(Rr0 * t, -1)
    b2 = jnp.sum(r1 * t, -1)
    det = a11 * a22 - a12 * a12
    z0 = (b1 * a22 - b2 * a12) / (det + 1e-15)
    z1 = (a11 * b2 - a12 * b1) / (det + 1e-15)
    return z0, z1


def _essential_8pt_weighted(p0, p1, w):
    """Weighted 8-point (DLT) refit over ALL points with weights w (N,):
    the LO step — a least-squares fit on the current inlier set, projected
    onto the essential manifold."""
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )  # (N, 9)
    AtA = jnp.einsum("ni,n,nj->ij", A, w, A)
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    S = jnp.zeros_like(E).at[0, 0].set(1.0).at[1, 1].set(1.0)
    return U @ S @ Vt


@partial(jax.jit, static_argnames=("n_iters", "solver"))
def ransac_essential(
    p0, p1, valid, th: float, rng, n_iters: int = 1024, solver: str = "5pt"
):
    """Essential-matrix RANSAC over normalized image coords.

    Minimal hypotheses come from the 5-point solver by default (up to 10
    candidate E per sample — the reference's cv2/poselib/pycolmap backends
    are all 5-point, `relative_pose/opencv.py:31-40`; at inlier ratio r the
    all-inlier sample probability is r^5 vs r^8), with ``solver="8pt"``
    keeping the old behavior. Local optimization is a weighted 8-point
    refit on the best hypothesis's inliers either way.

    p0/p1 (N, 2) normalized coords, valid (N,), th in normalized units.
    Returns dict with E, R, t (cheirality-resolved), inliers, num_inliers.
    """
    n = p0.shape[0]
    if solver == "5pt":
        from .essential5 import essential_5pt

        idx = _sample_minimal_sets(rng, n_iters, 5, n, valid)
        E_hyp = essential_5pt(p0[idx], p1[idx])  # (I, 10, 3, 3)
        E_hyp = E_hyp.reshape(-1, 3, 3)  # (10 I, 3, 3)
    else:
        idx = _sample_minimal_sets(rng, n_iters, 8, n, valid)
        E_hyp = _essential_8pt(p0[idx], p1[idx])  # (I, 3, 3)
    finite = jnp.isfinite(E_hyp).all(axis=(-1, -2))
    E_hyp = jnp.where(finite[:, None, None], E_hyp, 0.0)
    res = jax.vmap(_epipolar_residuals, in_axes=(0, None, None))(E_hyp, p0, p1)
    th2 = th * th
    inl = (res < th2) & valid[None, :]
    counts = jnp.where(finite, inl.sum(-1), -1)
    best = jnp.argmax(counts)
    E_best = E_hyp[best]
    inliers = inl[best]

    # local optimization: weighted 8-point refit on the inliers (2 rounds),
    # kept only when it does not lose consensus
    def refit(E, _):
        w = ((_epipolar_residuals(E, p0, p1) < th2) & valid).astype(jnp.float32)
        E_new = _essential_8pt_weighted(p0, p1, w)
        new_inl = (_epipolar_residuals(E_new, p0, p1) < th2) & valid
        ok = (
            jnp.isfinite(E_new).all()
            & (w.sum() >= 8)
            & (new_inl.sum() >= ((_epipolar_residuals(E, p0, p1) < th2) & valid).sum())
        )
        return jnp.where(ok, E_new, E), None

    E_best, _ = jax.lax.scan(refit, E_best, None, length=2)
    inliers = (_epipolar_residuals(E_best, p0, p1) < th2) & valid

    # decompose into 4 candidates, pick by cheirality over inliers
    U, _, Vt = jnp.linalg.svd(E_best)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E_best.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t_vec = U[:, 2]
    cands = [(R1, t_vec), (R1, -t_vec), (R2, t_vec), (R2, -t_vec)]
    scores = []
    for R, t in cands:
        z0, z1 = _triangulate_depths(R, t, p0, p1)
        scores.append(((z0 > 0) & (z1 > 0) & inliers).sum())
    scores = jnp.stack(scores)
    k = jnp.argmax(scores)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    R_best = Rs[k]
    t_best = ts[k]
    num = inliers.sum()
    return {
        "E": E_best,
        "R": R_best,
        "t": t_best,
        "inliers": inliers,
        "num_inliers": num,
        "success": num >= (5 if solver == "5pt" else 8),
    }


# ---------------------------------------------------------------------------
# Hybrid point + line homography RANSAC (role of the reference's
# homography_est C++ backend, `robust_estimators/homography/homography_est.py`)
# ---------------------------------------------------------------------------


def _line_residuals(H, lines0, lines1):
    """Perpendicular distance of warped lines0 endpoints to the (infinite)
    matched line in image 1, symmetrized: (L,)."""
    from ..geometry.homography import warp_points

    ep0 = lines0.reshape(-1, 2)  # (2L, 2)
    ep0_w = warp_points(ep0[None], H[None])[0].reshape(-1, 2, 2)  # (L, 2, 2)

    def perp_dist(endpoints, target):
        # endpoints (L, 2, 2); target (L, 2, 2) segment -> line (a, b, c)
        p0, p1 = target[:, 0], target[:, 1]
        d = p1 - p0
        n = jnp.stack([-d[:, 1], d[:, 0]], -1)
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)
        off = endpoints - p0[:, None, :]
        return jnp.abs((off * n[:, None, :]).sum(-1)).max(-1)  # (L,)

    d01 = perp_dist(ep0_w, lines1)
    ep1 = lines1.reshape(-1, 2)
    ep1_w = warp_points(ep1[None], jnp.linalg.inv(H)[None])[0].reshape(-1, 2, 2)
    d10 = perp_dist(ep1_w, lines0)
    return 0.5 * (d01 + d10)


@partial(jax.jit, static_argnames=("n_iters",))
def ransac_homography_hybrid(
    pts0, pts1, pt_valid, lines0, lines1, ln_valid, th: float, rng, n_iters: int = 1024
):
    """Joint point+line homography RANSAC: hypotheses from 4-point minimal
    samples, scored by point symmetric-transfer inliers PLUS line
    endpoint-to-line inliers; LO refit on point inliers.

    pts (N, 2) x2 with pt_valid (N,); lines (L, 2, 2) x2 with ln_valid (L,).
    """
    n = pts0.shape[0]
    idx = _sample_minimal_sets(rng, n_iters, 4, n, pt_valid)
    H_hyp = compute_homography_dlt(pts0[idx], pts1[idx])
    th2 = th * th

    def score(H):
        pres = _homography_residuals(H, pts0, pts1)
        p_inl = (pres < th2) & pt_valid
        lres = _line_residuals(H, lines0, lines1)
        l_inl = (lres < th) & ln_valid
        return p_inl.sum() + l_inl.sum(), p_inl, l_inl

    counts, p_inls, l_inls = jax.vmap(lambda H: score(H))(H_hyp)
    finite = jnp.isfinite(H_hyp).all(axis=(-1, -2))
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    H_best = H_hyp[best]

    def refit(H, _):
        w = ((_homography_residuals(H, pts0, pts1) < th2) & pt_valid).astype(jnp.float32)
        H_new = compute_homography_dlt(pts0[None], pts1[None], w[None])[0]
        ok = jnp.isfinite(H_new).all() & (w.sum() >= 4)
        return jnp.where(ok, H_new, H), None

    H_best, _ = jax.lax.scan(refit, H_best, None, length=2)
    p_inl = (_homography_residuals(H_best, pts0, pts1) < th2) & pt_valid
    l_inl = (_line_residuals(H_best, lines0, lines1) < th) & ln_valid
    return {
        "M_0to1": H_best,
        "inliers": p_inl,
        "line_inliers": l_inl,
        "num_inliers": p_inl.sum() + l_inl.sum(),
        "success": (p_inl.sum() >= 4) | (l_inl.sum() >= 4),
    }
