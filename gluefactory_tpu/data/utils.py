"""Host-side camera/pose fixups for dataset augmentation (role of reference
`datasets/utils.py:28-131`): intrinsics/pose updates under 90-degree image
rotations and resizing.

Deliberate divergence from the reference's rotation handling, pinned by
`tests/test_megadepth.py::test_rotate_intrinsics_pose_projective_exact`:

- The reference's own call site is broken: `megadepth.py:289` passes a
  (C, H, W) tensor shape into `datasets/utils.py:31`, whose `[:2]` slice
  then reads (channels, height) as (h, w). Parity would mean replicating
  that bug, so this module re-derives the update instead of matching it.
- Under this repo's COLMAP continuous-pixel convention (pixel (i, j) center
  at (j+0.5, i+0.5), image spanning [0, w] x [0, h] — CLAUDE.md), the
  principal-point flip is `w - cx` / `h - cy`, NOT the array-index form
  `w - 1 - cx` the reference uses: flipping the continuous interval [0, w]
  maps x to w - x.
- `rot` counts 90-degree CLOCKWISE (display-wise) image rotations, i.e. the
  image was rotated with `np.rot90(img, k=-rot)`; `image_shape` is the
  PRE-rotation (h, w). The companion pose update applies Rz(rot * 90deg) in
  the camera frame so that K' @ [R'|t'] projects every world point onto the
  rotated pixel grid exactly (the projective unit test asserts this to 1e-4
  px against brute-force index mapping, which catches both a 1-px flip
  error and any h/w swap).
"""

from __future__ import annotations

import numpy as np


def scale_intrinsics(K: np.ndarray, scales) -> np.ndarray:
    """Scale a 3x3 intrinsics matrix for image resizing by (sx, sy)."""
    scales = np.diag([scales[0], scales[1], 1.0])
    return (scales @ K).astype(np.float32)


def rotate_intrinsics(K: np.ndarray, image_shape, rot: int) -> np.ndarray:
    """Update intrinsics for `rot` 90-degree clockwise image rotations
    (`np.rot90(img, k=-rot)`) of an image of PRE-rotation shape (h, w[, c]).

    Continuous-coordinate pixel maps (see module docstring for derivation):
      rot=1 (cw):  (x', y') = (h - y, x)
      rot=2:       (x', y') = (w - x, h - y)
      rot=3 (ccw): (x', y') = (y, w - x)
    """
    h, w = image_shape[0], image_shape[1]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    rot = rot % 4
    if rot == 1:
        return np.array(
            [[fy, 0.0, h - cy], [0.0, fx, cx], [0.0, 0.0, 1.0]], dtype=np.float32
        )
    if rot == 2:
        return np.array(
            [[fx, 0.0, w - cx], [0.0, fy, h - cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )
    if rot == 3:
        return np.array(
            [[fy, 0.0, cy], [0.0, fx, w - cx], [0.0, 0.0, 1.0]], dtype=np.float32
        )
    return K.astype(np.float32)


def rotate_pose_inplane(T_w2cam: np.ndarray, rot: int) -> np.ndarray:
    """Apply the in-plane camera rotation matching `rot` 90-degree clockwise
    image rotations to a 4x4 world-to-camera pose: p' = Rz(rot * 90deg) p,
    so (x', y') = (h - y, x) at rot=1 comes out of K' @ p' exactly."""
    rot = rot % 4
    ang = np.deg2rad(90.0 * rot)
    R_inplane = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0.0, 0.0],
            [np.sin(ang), np.cos(ang), 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )
    return (R_inplane @ np.asarray(T_w2cam, np.float32)).astype(np.float32)
