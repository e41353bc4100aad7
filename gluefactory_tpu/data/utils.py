"""Host-side camera/pose fixups for dataset augmentation (role of reference
`datasets/utils.py:28-131`): intrinsics/pose updates under 90-degree image
rotations and resizing."""

from __future__ import annotations

import numpy as np


def scale_intrinsics(K: np.ndarray, scales) -> np.ndarray:
    """Scale a 3x3 intrinsics matrix for image resizing by (sx, sy)."""
    scales = np.diag([scales[0], scales[1], 1.0])
    return (scales @ K).astype(np.float32)


def rotate_intrinsics(K: np.ndarray, image_shape, rot: int) -> np.ndarray:
    """Update intrinsics for a clockwise rotation by rot*90 degrees of an
    image of (pre-rotation) shape (..., h, w)."""
    assert rot <= 3
    h, w = image_shape[-2:]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    rot = rot % 4
    if rot == 1:
        return np.array(
            [[fy, 0.0, cy], [0.0, fx, w - 1 - cx], [0.0, 0.0, 1.0]], dtype=np.float32
        )
    if rot == 2:
        return np.array(
            [[fx, 0.0, w - 1 - cx], [0.0, fy, h - 1 - cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )
    if rot == 3:
        return np.array(
            [[fy, 0.0, h - 1 - cy], [0.0, fx, cx], [0.0, 0.0, 1.0]], dtype=np.float32
        )
    return K.astype(np.float32)


def rotate_pose_inplane(T_w2cam: np.ndarray, rot: int) -> np.ndarray:
    """Apply an in-plane camera rotation of rot*90 degrees to a 4x4 pose."""
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
