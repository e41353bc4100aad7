"""Native COLMAP-style two-view geometry estimation (no pycolmap needed).

Role of reference `robust_estimators/relative_pose/pycolmap.py:9-52`
(`pycolmap.two_view_geometry_estimation`), rebuilt from the in-repo batched
XLA RANSACs: estimate BOTH an essential matrix (calibrated, normalized
residuals) and a homography (pixel residuals), then apply COLMAP's model
selection (colmap two_view_geometry.cc): if the homography explains almost
as many correspondences as the epipolar model, the scene is planar or the
motion a pure rotation — recover pose by homography decomposition
(Malis-Vargas, cheirality-resolved); otherwise use the essential-matrix
pose. Runs per pair on eval, like the reference.
"""

from __future__ import annotations

import jax
import numpy as np

from ...geometry.wrappers import Pose
from ...ops.ransac import ransac_essential, ransac_homography
from ..base_estimator import BaseEstimator
from ..homography.xla_ransac import bucket_pad


def decompose_homography(Hn: np.ndarray, p0: np.ndarray, p1: np.ndarray):
    """Decompose a CALIBRATED homography Hn = K1^-1 H K0 into (R, t), picking
    the solution with the most positive-depth (cheirality) points.

    SVD method: Hn ~ R + t n^T / d. Returns (R, t_unit, n) or None for
    degenerate (pure-rotation) cases where t ~ 0 (any n); then R = Hn
    normalized.
    """
    U, S, Vt = np.linalg.svd(Hn)
    Hs = Hn / S[1]  # scale so middle singular value is 1
    U, S, Vt = np.linalg.svd(Hs.T @ Hs)
    if np.linalg.det(U) < 0:
        U = -U
    s1, s3 = S[0], S[2]
    v1, v2, v3 = U.T
    if s1 - s3 < 1e-8:  # pure rotation
        R = Hs * np.sign(np.linalg.det(Hs))
        return [(R, np.zeros(3))]
    a = np.sqrt(max(1 - s3, 0.0))
    b = np.sqrt(max(s1 - 1, 0.0))
    nrm = np.sqrt(max(s1 - s3, 1e-12))
    u1 = (a * v1 + b * v3) / nrm
    u2 = (a * v1 - b * v3) / nrm
    sols = []
    for u in (u1, u2):
        # two sign choices per u
        W = np.stack([v2, u, np.cross(v2, u)], axis=1)
        Uw = np.stack([Hs @ v2, Hs @ u, np.cross(Hs @ v2, Hs @ u)], axis=1)
        R = Uw @ W.T
        n = np.cross(v2, u)
        t = (Hs - R) @ n
        for sgn in (1.0, -1.0):
            sols.append((R, sgn * t))
    return sols


def _cheirality_count(R, t, p0, p1):
    """Count points triangulating with positive depth in both views."""
    # midpoint-free linear triangulation per point (DLT on two rays)
    P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = np.hstack([R, t.reshape(3, 1)])
    cnt = 0
    for a, b in zip(p0, p1):
        A = np.stack(
            [
                a[0] * P0[2] - P0[0],
                a[1] * P0[2] - P0[1],
                b[0] * P1[2] - P1[0],
                b[1] * P1[2] - P1[1],
            ]
        )
        _, _, Vt = np.linalg.svd(A)
        X = Vt[-1]
        if abs(X[3]) < 1e-12:
            continue
        X = X[:3] / X[3]
        z0 = X[2]
        z1 = (R @ X + t)[2]
        if z0 > 0 and z1 > 0:
            cnt += 1
    return cnt


class NativeTwoViewEstimator(BaseEstimator):
    default_conf = {
        "ransac_th": 4.0,  # px, matching pycolmap's default max_error
        "solver": "5pt",  # COLMAP's E hypotheses are 5-point too
        "n_iters": 512,
        "seed": 0,
        # COLMAP TwoViewGeometryOptions defaults
        "min_num_inliers": 15,
        "max_H_inlier_ratio": 0.8,  # H/E inlier ratio => planar/panoramic
    }

    def _forward(self, data: dict) -> dict:
        kpts0 = np.asarray(data["m_kpts0"], np.float32)
        kpts1 = np.asarray(data["m_kpts1"], np.float32)
        camera0 = data["camera0"]
        camera1 = data["camera1"]
        fail = {
            "success": False,
            "M_0to1": Pose.identity(),
            "inliers": np.zeros(len(kpts0), bool),
        }
        if len(kpts0) < 8:
            return fail

        f_mean = 0.5 * (
            float(np.asarray(camera0.f).mean()) + float(np.asarray(camera1.f).mean())
        )
        norm_th = float(self.conf.ransac_th) / f_mean
        n0 = np.asarray(camera0.normalize(kpts0[None]))[0]
        n1 = np.asarray(camera1.normalize(kpts1[None]))[0]
        key = jax.random.key(self.conf.seed)

        p0n, p1n, valid, n = bucket_pad(n0, n1)
        e_out = ransac_essential(
            p0n, p1n, valid, norm_th, key,
            n_iters=int(self.conf.n_iters), solver=str(self.conf.solver),
        )
        e_inl = np.asarray(e_out["inliers"])[:n]
        e_ninl = int(e_inl.sum())

        p0p, p1p, validp, _ = bucket_pad(kpts0, kpts1)
        h_out = ransac_homography(
            p0p, p1p, validp, float(self.conf.ransac_th), key,
            n_iters=int(self.conf.n_iters),
        )
        h_inl = np.asarray(h_out["inliers"])[:n]
        h_ninl = int(h_inl.sum())

        if max(e_ninl, h_ninl) < int(self.conf.min_num_inliers):
            return fail

        planar = h_ninl > self.conf.max_H_inlier_ratio * max(e_ninl, 1)
        if not planar and bool(e_out["success"]):
            R = np.asarray(e_out["R"], np.float64)
            t = np.asarray(e_out["t"], np.float64)
            inliers = e_inl
        else:
            # pose from the calibrated homography (planar / panoramic)
            H = np.asarray(h_out["M_0to1"], np.float64)

            def K_of(cam):
                f = np.asarray(cam.f, np.float64).reshape(-1)[-2:]
                c = np.asarray(cam.c, np.float64).reshape(-1)[-2:]
                return np.array(
                    [[f[0], 0, c[0]], [0, f[1], c[1]], [0, 0, 1]], np.float64)

            Hn = np.linalg.inv(K_of(camera1)) @ H @ K_of(camera0)
            best, best_cnt = None, -1
            sample = np.flatnonzero(h_inl)[:32]
            for R, t in decompose_homography(Hn, n0, n1):
                nt = np.linalg.norm(t)
                tt = t / nt if nt > 1e-9 else t
                cnt = (
                    _cheirality_count(R, tt, n0[sample], n1[sample])
                    if nt > 1e-9 else 0
                )
                if cnt > best_cnt or best is None:
                    best, best_cnt = (R, tt), cnt
            R, t = best
            inliers = h_inl

        return {
            "success": True,
            "M_0to1": Pose.from_Rt(
                np.asarray(R, np.float32), np.asarray(t, np.float32)
            ),
            "inliers": inliers,
        }
