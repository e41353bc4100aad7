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
    dist_sq: jnp.ndarray,
    pos_th_sq: float,
    negative0: jnp.ndarray,
    negative1: jnp.ndarray,
    ignore0: jnp.ndarray | None = None,
    ignore1: jnp.ndarray | None = None,
):
    """Mutual-nearest assignment, reference semantics
    (`gt_generation.py:55-74,145-156`): positives are mutual row/col minima
    of the SQUARED symmetric distance matrix below pos_th_sq; labels are
    positive -> argmin, `negativeX` -> UNMATCHED, everything else IGNORE.
    `ignoreX` forces IGNORE (mask extension: padding slots are never
    supervised).
    """
    B, M, N = dist_sq.shape
    min0 = dist_sq.min(axis=-1)
    min1 = dist_sq.min(axis=-2)
    argmin0 = jnp.argmin(dist_sq, axis=-1)  # (B, M)
    argmin1 = jnp.argmin(dist_sq, axis=-2)  # (B, N)
    inv0 = jnp.take_along_axis(argmin1, argmin0, axis=-1)  # (B, M)
    inv1 = jnp.take_along_axis(argmin0, argmin1, axis=-1)  # (B, N)
    arange0 = jnp.arange(M)[None]
    arange1 = jnp.arange(N)[None]
    mutual0 = inv0 == arange0
    mutual1 = inv1 == arange1

    positive0 = mutual0 & (min0 < pos_th_sq)
    positive1 = mutual1 & (min1 < pos_th_sq)
    if ignore0 is not None:
        positive0 = positive0 & ~ignore0
        negative0 = negative0 & ~ignore0
    if ignore1 is not None:
        positive1 = positive1 & ~ignore1
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
    # forward and backward SQUARED reprojection distances; negatives come
    # from the ONE-DIRECTIONAL matrices (reference gt_generation.py:124-141)
    dist0 = jnp.sum((kp0_1[..., :, None, :] - kp1[..., None, :, :]) ** 2, axis=-1)
    dist1 = jnp.sum((kp0[..., :, None, :] - kp1_0[..., None, :, :]) ** 2, axis=-1)
    inf = jnp.asarray(jnp.inf, dist0.dtype)
    if mask0 is not None:  # padding rows/cols never participate
        dist0 = jnp.where(mask0[..., :, None], dist0, inf)
        dist1 = jnp.where(mask0[..., :, None], dist1, inf)
    if mask1 is not None:
        dist0 = jnp.where(mask1[..., None, :], dist0, inf)
        dist1 = jnp.where(mask1[..., None, :], dist1, inf)
    dist = jnp.maximum(dist0, dist1)
    negative0 = dist0.min(axis=-1) > neg_th**2
    negative1 = dist1.min(axis=-2) > neg_th**2
    return _assignment_from_dists(
        dist, pos_th**2, negative0, negative1,
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

    # SQUARED distances; the symmetric matrix is masked by pairwise
    # visibility, the one-directional matrices stay raw for negatives
    # (reference gt_generation.py:48-65)
    dist0 = jnp.sum((kp0_1[..., :, None, :] - kp1[..., None, :, :]) ** 2, axis=-1)
    dist1 = jnp.sum((kp0[..., :, None, :] - kp1_0[..., None, :, :]) ** 2, axis=-1)
    inf = jnp.asarray(jnp.inf, dist0.dtype)
    if mask0 is not None:  # padding slots never participate at all
        dist0 = jnp.where(mask0[..., :, None], dist0, inf)
        dist1 = jnp.where(mask0[..., :, None], dist1, inf)
    if mask1 is not None:
        dist0 = jnp.where(mask1[..., None, :], dist0, inf)
        dist1 = jnp.where(mask1[..., None, :], dist1, inf)
    mask_visible = vis0[..., :, None] & vis1[..., None, :]
    dist = jnp.where(mask_visible, jnp.maximum(dist0, dist1), inf)

    negative0 = (dist0.min(axis=-1) > neg_th**2) & valid0
    negative1 = (dist1.min(axis=-2) > neg_th**2) & valid1
    out = _assignment_from_dists(
        dist, pos_th**2, negative0, negative1,
        ignore0=None if mask0 is None else ~mask0,
        ignore1=None if mask1 is None else ~mask1,
    )

    # Epipolar rescue (reference :76-92): invalid-depth points that are far
    # (> neg_th px) from every still-uncertain point's epipolar line become
    # confident negatives. F applies in pixel space; the distance is the
    # NON-squared mean line distance.
    if epi_th is not None:
        K0 = camera0.calibration_matrix()
        K1 = camera1.calibration_matrix()
        F = (
            jnp.swapaxes(jnp.linalg.inv(K1), -1, -2)
            @ T_to_E(T_0to1)
            @ jnp.linalg.inv(K0)
        )
        epi_dist = sym_epipolar_distance_all(kp0, kp1, F)
        m0, m1 = out["matches0"], out["matches1"]
        mask_ignore = (m0[..., :, None] == IGNORE) & (m1[..., None, :] == IGNORE)
        epi_dist = jnp.where(mask_ignore, epi_dist, inf)
        exclude0 = epi_dist.min(axis=-1) > neg_th
        exclude1 = epi_dist.min(axis=-2) > neg_th
        new0 = ~valid0 & exclude0
        new1 = ~valid1 & exclude1
        if mask0 is not None:  # padding slots stay IGNORE
            new0 = new0 & mask0
        if mask1 is not None:
            new1 = new1 & mask1
        out["matches0"] = jnp.where(new0, UNMATCHED, m0).astype(jnp.int32)
        out["matches1"] = jnp.where(new1, UNMATCHED, m1).astype(jnp.int32)

    out["visible0"] = vis0
    out["visible1"] = vis1
    return out


def gt_from_matches0(matches0: jnp.ndarray, n1: int):
    """Expand matches0 (B, M) into a bool assignment matrix (B, M, n1)."""
    B, M = matches0.shape
    cols = jnp.arange(n1)[None, None, :]
    return (matches0[..., None] == cols) & (matches0[..., None] >= 0)
