"""5-point essential minimal solver + 5pt-RANSAC parity vs cv2.

VERDICT r2 mandate #2: the reference's pose backends all hypothesize from 5
correspondences (`/root/reference/gluefactory/robust_estimators/relative_pose/
opencv.py:31-64` cv2.findEssentialMat 5-point + recoverPose). These tests
check (a) the batched XLA hidden-variable solver recovers exact E on minimal
samples, (b) the full 5pt RANSAC matches cv2's pose accuracy across outlier
ratios 0.2..0.6 on synthetic scenes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gluefactory_tpu.ops.essential5 import essential_5pt
from gluefactory_tpu.ops.ransac import ransac_essential


def _rotvec_to_R(a):
    th = np.linalg.norm(a)
    if th < 1e-12:
        return np.eye(3)
    k = a / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _make_scene(rng, n, noise=0.0, outlier_ratio=0.0):
    a = rng.normal(size=3)
    a = a / np.linalg.norm(a) * rng.uniform(0.1, 0.5)
    R = _rotvec_to_R(a)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-1, 1, size=(n, 3))
    X[:, 2] = rng.uniform(2, 6, size=n)
    p0 = X[:, :2] / X[:, 2:3]
    X1 = X @ R.T + t
    p1 = X1[:, :2] / X1[:, 2:3]
    p0 = p0 + rng.normal(size=p0.shape) * noise
    p1 = p1 + rng.normal(size=p1.shape) * noise
    n_out = int(round(outlier_ratio * n))
    if n_out:
        idx = rng.choice(n, size=n_out, replace=False)
        p1[idx] = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return p0, p1, R, t, E / np.linalg.norm(E)


def _angular_errors(R_est, t_est, R_gt, t_gt):
    cos_r = (np.trace(R_est.T @ R_gt) - 1) / 2
    r_err = np.degrees(np.arccos(np.clip(cos_r, -1, 1)))
    cos_t = abs(np.dot(t_est / np.linalg.norm(t_est), t_gt))
    t_err = np.degrees(np.arccos(np.clip(cos_t, -1, 1)))
    return r_err, t_err


def test_essential_5pt_exact_minimal():
    """On exact 5-point samples, one of the candidate E matches GT."""
    rng = np.random.default_rng(0)
    scenes = [_make_scene(rng, 5) for _ in range(64)]
    p0 = jnp.asarray(np.stack([s[0] for s in scenes]), jnp.float32)
    p1 = jnp.asarray(np.stack([s[1] for s in scenes]), jnp.float32)
    Egt = np.stack([s[4] for s in scenes])
    Ecand = np.asarray(jax.jit(essential_5pt)(p0, p1))  # (B, 10, 3, 3)
    errs = []
    for b in range(len(scenes)):
        best = np.inf
        for k in range(10):
            E = Ecand[b, k]
            if not np.isfinite(E).all():
                continue
            E = E / np.linalg.norm(E)
            best = min(best, np.abs(E - Egt[b]).max(), np.abs(E + Egt[b]).max())
        errs.append(best)
    errs = np.asarray(errs)
    # f32 end to end; sign-scan can miss near-tangent root pairs on a few
    # scenes (RANSAC absorbs those as lost hypotheses)
    assert np.median(errs) < 1e-4
    assert (errs < 1e-2).mean() >= 0.9


def test_essential_5pt_epipolar_consistency():
    """Every finite candidate satisfies the 5 epipolar constraints and the
    essential-manifold conditions (det E = 0, 2EE^T E - tr(EE^T)E = 0)."""
    rng = np.random.default_rng(3)
    scenes = [_make_scene(rng, 5) for _ in range(16)]
    p0 = np.stack([s[0] for s in scenes])
    p1 = np.stack([s[1] for s in scenes])
    Ecand = np.asarray(
        essential_5pt(jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32))
    )
    p0h = np.concatenate([p0, np.ones_like(p0[..., :1])], -1)
    p1h = np.concatenate([p1, np.ones_like(p1[..., :1])], -1)
    n_checked = 0
    for b in range(len(scenes)):
        for k in range(10):
            E = Ecand[b, k]
            if not np.isfinite(E).all():
                continue
            n_checked += 1
            resid = np.einsum("ni,ij,nj->n", p1h[b], E, p0h[b])
            assert np.abs(resid).max() < 1e-3
            assert abs(np.linalg.det(E)) < 1e-3
            tc = 2 * E @ E.T @ E - np.trace(E @ E.T) * E
            assert np.abs(tc).max() < 1e-2
    assert n_checked >= len(scenes)  # at least one real root per scene


@pytest.mark.parametrize("outlier_ratio", [0.2, 0.4, 0.6])
@pytest.mark.slow
def test_ransac_5pt_vs_cv2(outlier_ratio):
    """Full 5pt XLA RANSAC pose accuracy matches cv2.findEssentialMat on
    synthetic scenes with noise + outliers (VERDICT #2 done-criteria)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(int(outlier_ratio * 10))
    n = 200
    noise = 1e-3  # ~1px at f=1000
    th = 2e-3

    ours_max, cv2_max = [], []
    for s in range(6):
        p0, p1, R_gt, t_gt, _ = _make_scene(
            rng, n, noise=noise, outlier_ratio=outlier_ratio
        )
        out = ransac_essential(
            jnp.asarray(p0, jnp.float32),
            jnp.asarray(p1, jnp.float32),
            jnp.ones(n, bool),
            th,
            jax.random.key(s),
            n_iters=512,
            solver="5pt",
        )
        assert bool(out["success"])
        r_err, t_err = _angular_errors(
            np.asarray(out["R"]), np.asarray(out["t"]), R_gt, t_gt
        )
        ours_max.append(max(r_err, t_err))

        E_cv, mask = cv2.findEssentialMat(
            p0.astype(np.float64),
            p1.astype(np.float64),
            np.eye(3),
            method=cv2.RANSAC,
            prob=0.999,
            threshold=th,
        )
        _, R_cv, t_cv, _ = cv2.recoverPose(
            E_cv[:3], p0.astype(np.float64), p1.astype(np.float64), np.eye(3),
            mask=mask.copy(),
        )
        r_err, t_err = _angular_errors(R_cv, t_cv[:, 0], R_gt, t_gt)
        cv2_max.append(max(r_err, t_err))

    ours = np.median(ours_max)
    ref = np.median(cv2_max)
    # within noise of cv2 (both should be ~sub-degree at this noise level)
    assert ours < max(2.0 * ref, 1.0), (ours, ref, ours_max, cv2_max)


@pytest.mark.slow
def test_ransac_5pt_beats_8pt_at_high_outliers():
    """The motivating claim: 5-point minimal sampling survives outlier rates
    where 8-point sampling starts failing (r^5 vs r^8)."""
    rng = np.random.default_rng(42)
    n = 150
    failures = {"5pt": 0, "8pt": 0}
    errs = {"5pt": [], "8pt": []}
    for s in range(5):
        p0, p1, R_gt, t_gt, _ = _make_scene(rng, n, noise=1e-3, outlier_ratio=0.6)
        for solver in ("5pt", "8pt"):
            out = ransac_essential(
                jnp.asarray(p0, jnp.float32),
                jnp.asarray(p1, jnp.float32),
                jnp.ones(n, bool),
                2e-3,
                jax.random.key(100 + s),
                # at 60% outliers: ~4 expected all-inlier samples for 5pt
                # (0.4^5 * 384), ~0.25 for 8pt (0.4^8 * 384) — the gap the
                # test demonstrates
                n_iters=384,
                solver=solver,
            )
            r_err, t_err = _angular_errors(
                np.asarray(out["R"]), np.asarray(out["t"]), R_gt, t_gt
            )
            e = max(r_err, t_err)
            errs[solver].append(e)
            failures[solver] += e > 5.0
    assert failures["5pt"] <= failures["8pt"], (errs, failures)
    assert np.median(errs["5pt"]) < 2.0, errs
