"""Ground-truth correspondence generation for supervision.

Role of reference `geometry/gt_generation.py:14-161` (point GT; line GT lives
in `gt_lines.py` beside GlueStick). Fully batched, static shapes, jit-safe —
this runs inside the training step on device (the reference runs it on GPU in
the loss path too).

Match conventions (SURVEY §1): `matches0[i]` = index of the keypoint in image 1
matching keypoint i of image 0; -1 = unmatched (certain negative), -2 = ignore
(uncertain — excluded from the loss).
"""

from __future__ import annotations

import jax.numpy as jnp

from .depth import project, sample_depth
from .epipolar import T_to_E, sym_epipolar_distance_all
from .homography import warp_points
from .wrappers import Camera, Pose

IGNORE = -2
UNMATCHED = -1


def _assignment_from_dists(
    dist: jnp.ndarray,
    pos_th: float,
    neg_th: float,
    ignore0: jnp.ndarray | None = None,
    ignore1: jnp.ndarray | None = None,
):
    """Mutual-nearest assignment with positive/negative bands.

    dist: (B, M, N) distance matrix (inf where invalid).
    Returns dict(assignment (B,M,N) bool, matches0 (B,M), matches1 (B,N)).
    `ignoreX`: bool masks of rows/cols whose negatives are uncertain (forced to
    IGNORE instead of UNMATCHED).
    """
    B, M, N = dist.shape
    min0 = dist.min(axis=-1)
    min1 = dist.min(axis=-2)
    argmin0 = jnp.argmin(dist, axis=-1)  # (B, M)
    argmin1 = jnp.argmin(dist, axis=-2)  # (B, N)
    inv0 = jnp.take_along_axis(argmin1, argmin0, axis=-1)  # (B, M)
    inv1 = jnp.take_along_axis(argmin0, argmin1, axis=-1)  # (B, N)
    arange0 = jnp.arange(M)[None]
    arange1 = jnp.arange(N)[None]
    mutual0 = inv0 == arange0
    mutual1 = inv1 == arange1

    positive0 = mutual0 & (min0 < pos_th)
    positive1 = mutual1 & (min1 < pos_th)
    negative0 = min0 > neg_th
    negative1 = min1 > neg_th
    if ignore0 is not None:
        negative0 = negative0 & ~ignore0
    if ignore1 is not None:
        negative1 = negative1 & ~ignore1

    matches0 = jnp.where(positive0, argmin0, jnp.where(negative0, UNMATCHED, IGNORE))
    matches1 = jnp.where(positive1, argmin1, jnp.where(negative1, UNMATCHED, IGNORE))
    assignment = (
        positive0[..., :, None]
        & positive1[..., None, :]
        & (argmin0[..., :, None] == arange1[..., None, :])
    )
    return {
        "assignment": assignment,
        "matches0": matches0.astype(jnp.int32),
        "matches1": matches1.astype(jnp.int32),
    }


def gt_matches_from_homography(
    kp0: jnp.ndarray,
    kp1: jnp.ndarray,
    H: jnp.ndarray,
    pos_th: float = 3.0,
    neg_th: float = 6.0,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
):
    """GT matches for homography-related views (reference
    `gt_generation.py:110-161`). kp0 (B, M, 2), kp1 (B, N, 2), H (B, 3, 3).

    `maskX` (B, M/N) bool: padding slots. Masked keypoints can never be
    positives (the padding coordinates are meaningless — wireframe invalid
    slots all sit at (0,0) and would otherwise cross-match) and are labelled
    IGNORE, not UNMATCHED, so the loss never supervises them."""
    kp0_1 = warp_points(kp0, H)
    kp1_0 = warp_points(kp1, H, inverse=True)
    # forward and backward reprojection distance, symmetric max
    dist0 = jnp.linalg.norm(kp0_1[..., :, None, :] - kp1[..., None, :, :], axis=-1)
    dist1 = jnp.linalg.norm(kp0[..., :, None, :] - kp1_0[..., None, :, :], axis=-1)
    dist = jnp.maximum(dist0, dist1)
    if mask0 is not None:
        dist = jnp.where(mask0[..., :, None], dist, jnp.inf)
    if mask1 is not None:
        dist = jnp.where(mask1[..., None, :], dist, jnp.inf)
    return _assignment_from_dists(
        dist, pos_th, neg_th,
        ignore0=None if mask0 is None else ~mask0,
        ignore1=None if mask1 is None else ~mask1,
    )


def gt_matches_from_pose_depth(
    kp0: jnp.ndarray,
    kp1: jnp.ndarray,
    camera0: Camera,
    camera1: Camera,
    T_0to1: Pose,
    depth0: jnp.ndarray,
    depth1: jnp.ndarray,
    pos_th: float = 3.0,
    neg_th: float = 5.0,
    epi_th: float | None = None,
    ccth: float | None = None,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
):
    """GT matches from relative pose + depth maps (reference
    `gt_generation.py:14-106`).

    Strategy: sample depths at keypoints, project each set into the other
    view, build the symmetric max reprojection-distance matrix, run mutual-NN
    assignment. Keypoints with invalid depth can't be labelled negative by
    reprojection; an epipolar-distance check (threshold `epi_th` px) recovers
    confident negatives among them, the rest become IGNORE. `maskX`: padding
    slots — never positive, always IGNORE (see gt_matches_from_homography).
    """
    d0, valid0 = sample_depth(kp0, depth0)
    d1, valid1 = sample_depth(kp1, depth1)
    if mask0 is not None:
        valid0 = valid0 & mask0
    if mask1 is not None:
        valid1 = valid1 & mask1

    kp0_1, vis0 = project(kp0, d0, depth1, camera0, camera1, T_0to1, valid0, ccth=ccth)
    kp1_0, vis1 = project(kp1, d1, depth0, camera1, camera0, T_0to1.inv(), valid1, ccth=ccth)

    dist0 = jnp.linalg.norm(kp0_1[..., :, None, :] - kp1[..., None, :, :], axis=-1)
    dist1 = jnp.linalg.norm(kp0[..., :, None, :] - kp1_0[..., None, :, :], axis=-1)
    inf = jnp.asarray(jnp.inf, dist0.dtype)
    dist0 = jnp.where(vis0[..., :, None], dist0, inf)
    dist1 = jnp.where(vis1[..., None, :], dist1, inf)
    dist = jnp.maximum(dist0, dist1)

    # Epipolar fallback for invalid-depth points: normalized-coordinate
    # symmetric epipolar distance vs threshold scaled to pixels via focal.
    if epi_th is not None:
        E = T_to_E(T_0to1)
        p0n = camera0.normalize(kp0)
        p1n = camera1.normalize(kp1)
        epi_dist = jnp.sqrt(jnp.abs(sym_epipolar_distance_all(p0n, p1n, E)) + 1e-15)
        f_mean = 0.5 * (
            camera0.f.mean(axis=-1)[..., None, None] + camera1.f.mean(axis=-1)[..., None, None]
        )
        epi_px = epi_dist * f_mean
        # a pair is epipolar-negative if far from the epipolar line
        epi_min0 = epi_px.min(axis=-1)
        epi_min1 = epi_px.min(axis=-2)
        unsure0 = ~vis0 & (epi_min0 <= epi_th)
        unsure1 = ~vis1 & (epi_min1 <= epi_th)
        if mask0 is not None:
            unsure0 = unsure0 | ~mask0
        if mask1 is not None:
            unsure1 = unsure1 | ~mask1
        # invalid-depth rows with small epipolar distance: uncertain -> ignore
        out = _assignment_from_dists(dist, pos_th, neg_th, ignore0=unsure0, ignore1=unsure1)
    else:
        # invalid-depth rows are always uncertain
        out = _assignment_from_dists(dist, pos_th, neg_th, ignore0=~vis0, ignore1=~vis1)

    out["visible0"] = vis0
    out["visible1"] = vis1
    return out


def gt_from_matches0(matches0: jnp.ndarray, n1: int):
    """Expand matches0 (B, M) into a bool assignment matrix (B, M, n1)."""
    B, M = matches0.shape
    cols = jnp.arange(n1)[None, None, :]
    return (matches0[..., None] == cols) & (matches0[..., None] >= 0)
