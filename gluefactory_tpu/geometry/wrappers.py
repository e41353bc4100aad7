"""Batched differentiable Pose (SE3) and pinhole Camera as JAX pytrees.

Role of reference `geometry/wrappers.py:111-425` (torch TensorWrapper). Here
the natural JAX idiom is a registered pytree dataclass: `Pose`/`Camera`
instances flow through `jit`, `vmap`, `grad` and live inside batch dicts.

Conventions:
  - `Pose` maps points FROM world/frame-a TO the camera/frame-b: p_b = R p_a + t.
  - `Camera` follows COLMAP: pixel (0.5, 0.5) is the center of the top-left
    pixel; `cam2image` = denormalize(distort(project(p_cam))).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .utils import distort_points, to_homogeneous, undistort_points


@jax.tree_util.register_pytree_node_class
class Pose:
    """Batched SE(3) transform storing R (..., 3, 3) and t (..., 3)."""

    def __init__(self, R: jnp.ndarray, t: jnp.ndarray):
        self.R = jnp.asarray(R)
        self.t = jnp.asarray(t)

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_Rt(cls, R, t) -> "Pose":
        return cls(R, t)

    @classmethod
    def from_aa(cls, aa, t) -> "Pose":
        from .utils import so3exp_map

        return cls(so3exp_map(jnp.asarray(aa)), t)

    @classmethod
    def from_4x4mat(cls, T) -> "Pose":
        T = jnp.asarray(T)
        return cls(T[..., :3, :3], T[..., :3, 3])

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(batch_shape) + (3, 3))
        t = jnp.zeros(tuple(batch_shape) + (3,), dtype=dtype)
        return cls(R, t)

    @classmethod
    def from_colmap(cls, image) -> "Pose":
        return cls.from_4x4mat(np.asarray(image.cam_from_world.matrix()))

    @classmethod
    def stack(cls, poses: Sequence["Pose"], axis: int = 0) -> "Pose":
        return cls(
            jnp.stack([p.R for p in poses], axis=axis),
            jnp.stack([p.t for p in poses], axis=axis),
        )

    @classmethod
    def concatenate(cls, poses: Sequence["Pose"], axis: int = 0) -> "Pose":
        return cls(
            jnp.concatenate([p.R for p in poses], axis=axis),
            jnp.concatenate([p.t for p in poses], axis=axis),
        )

    # -- pytree -----------------------------------------------------------
    def tree_flatten(self):
        return (self.R, self.t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        # MUST be purely structural: jax unflattens with non-array
        # placeholders (ArgInfo during .lower(), tracers, None in
        # tree_map over structures), which __init__'s jnp.asarray rejects
        obj = cls.__new__(cls)
        obj.R, obj.t = children
        return obj

    # -- core ops ---------------------------------------------------------
    @property
    def shape(self):
        return self.t.shape[:-1]

    @property
    def dtype(self):
        return self.t.dtype

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.R[idx], self.t[idx])

    def astype(self, dtype) -> "Pose":
        return Pose(self.R.astype(dtype), self.t.astype(dtype))

    def inv(self) -> "Pose":
        R_inv = jnp.swapaxes(self.R, -1, -2)
        return Pose(R_inv, -jnp.einsum("...ij,...j->...i", R_inv, self.t))

    def compose(self, other: "Pose") -> "Pose":
        """self @ other: apply `other` first, then `self`."""
        return Pose(
            self.R @ other.R,
            jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
        )

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    def transform(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Transform (..., N, 3) points."""
        return jnp.einsum("...ij,...nj->...ni", self.R, p3d) + self.t[..., None, :]

    def magnitude(self):
        """Return (rotation angle in degrees, translation norm)."""
        trace = jnp.trace(self.R, axis1=-1, axis2=-2)
        cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
        dr = jnp.rad2deg(jnp.abs(jnp.arccos(cos)))
        dt = jnp.linalg.norm(self.t, axis=-1)
        return dr, dt

    def matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        Rt = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        bottom = jnp.zeros_like(Rt[..., :1, :]).at[..., 0, 3].set(1.0)
        return jnp.concatenate([Rt, bottom], axis=-2)

    def __repr__(self):
        return f"Pose(shape={self.shape}, dtype={self.dtype})"


@jax.tree_util.register_pytree_node_class
class Camera:
    """Batched pinhole(+radial distortion) camera.

    Stores: size (..., 2) [w, h], f (..., 2), c (..., 2), dist (..., D).
    D is static (part of the pytree structure via array shape).
    """

    def __init__(self, size, f, c, dist=None):
        self.size = jnp.asarray(size)
        self.f = jnp.asarray(f)
        self.c = jnp.asarray(c)
        if dist is None:
            dist = jnp.zeros(self.f.shape[:-1] + (0,), dtype=self.f.dtype)
        self.dist = jnp.asarray(dist)

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_calibration_matrix(cls, K, size=None) -> "Camera":
        K = jnp.asarray(K)
        f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
        c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
        if size is None:
            size = jnp.ceil(c * 2.0)
        return cls(size, f, c)

    @classmethod
    def from_colmap(cls, camera: dict) -> "Camera":
        """Build from a COLMAP camera dict {model, width, height, params}
        (mirrors reference `wrappers.py:262-300`)."""
        model = camera["model"]
        params = np.asarray(camera["params"], dtype=np.float64)
        w, h = camera["width"], camera["height"]
        if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
            (fx,) = params[:1]
            fy = fx
            cx, cy = params[1:3]
            dist = params[3:]
        elif model in ("PINHOLE", "OPENCV", "OPENCV_FISHEYE", "FULL_OPENCV"):
            fx, fy, cx, cy = params[:4]
            dist = params[4:]
        else:
            raise ValueError(f"unsupported COLMAP model {model}")
        return cls(
            jnp.asarray([w, h], dtype=jnp.float32),
            jnp.asarray([fx, fy], dtype=jnp.float32),
            jnp.asarray([cx, cy], dtype=jnp.float32),
            jnp.asarray(dist, dtype=jnp.float32),
        )

    @classmethod
    def stack(cls, cams: Sequence["Camera"], axis: int = 0) -> "Camera":
        return cls(
            jnp.stack([x.size for x in cams], axis=axis),
            jnp.stack([x.f for x in cams], axis=axis),
            jnp.stack([x.c for x in cams], axis=axis),
            jnp.stack([x.dist for x in cams], axis=axis),
        )

    @classmethod
    def concatenate(cls, cams: Sequence["Camera"], axis: int = 0) -> "Camera":
        return cls(
            jnp.concatenate([x.size for x in cams], axis=axis),
            jnp.concatenate([x.f for x in cams], axis=axis),
            jnp.concatenate([x.c for x in cams], axis=axis),
            jnp.concatenate([x.dist for x in cams], axis=axis),
        )

    # -- pytree -----------------------------------------------------------
    def tree_flatten(self):
        return (self.size, self.f, self.c, self.dist), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        # purely structural (see Pose.tree_unflatten)
        obj = cls.__new__(cls)
        obj.size, obj.f, obj.c, obj.dist = children
        return obj

    @property
    def shape(self):
        return self.f.shape[:-1]

    @property
    def dtype(self):
        return self.f.dtype

    def __getitem__(self, idx) -> "Camera":
        return Camera(self.size[idx], self.f[idx], self.c[idx], self.dist[idx])

    def astype(self, dtype) -> "Camera":
        return Camera(
            self.size.astype(dtype), self.f.astype(dtype),
            self.c.astype(dtype), self.dist.astype(dtype),
        )

    # -- geometry ---------------------------------------------------------
    def scale(self, scales) -> "Camera":
        """Rescale for image resizing; `scales` is scalar or (..., 2)."""
        s = jnp.broadcast_to(jnp.asarray(scales, dtype=self.f.dtype), self.f.shape)
        return Camera(self.size * s, self.f * s, self.c * s, self.dist)

    def crop(self, left_top, new_size) -> "Camera":
        lt = jnp.asarray(left_top, dtype=self.c.dtype)
        return Camera(jnp.asarray(new_size, dtype=self.size.dtype), self.f, self.c - lt, self.dist)

    def project(self, p3d: jnp.ndarray):
        """(..., N, 3) camera-frame points -> normalized 2D + validity."""
        z = p3d[..., -1]
        valid = z > 1e-3
        z_safe = jnp.where(valid, z, jnp.ones_like(z))
        p2d = p3d[..., :-1] / z_safe[..., None]
        return p2d, valid

    def distort(self, p2d: jnp.ndarray):
        if self.dist.shape[-1] == 0:
            return p2d, jnp.ones(p2d.shape[:-1], dtype=bool)
        return distort_points(p2d, self.dist[..., None, :])

    def undistort(self, p2d: jnp.ndarray):
        if self.dist.shape[-1] == 0:
            return p2d, jnp.ones(p2d.shape[:-1], dtype=bool)
        return (
            undistort_points(p2d, self.dist[..., None, :]),
            jnp.ones(p2d.shape[:-1], dtype=bool),
        )

    def denormalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        return p2d * self.f[..., None, :] + self.c[..., None, :]

    def normalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        return (p2d - self.c[..., None, :]) / self.f[..., None, :]

    def in_image(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Check whether pixel points fall inside the image bounds."""
        size = self.size[..., None, :]
        return jnp.all((p2d >= 0) & (p2d <= size - 1), axis=-1)

    def cam2image(self, p3d: jnp.ndarray):
        """(..., N, 3) camera-frame -> pixel coords + validity."""
        p2d, visible = self.project(p3d)
        p2d, mask = self.distort(p2d)
        p2d = self.denormalize(p2d)
        valid = visible & mask & self.in_image(p2d)
        return p2d, valid

    def image2cam(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Pixel coords -> unit-depth 3D rays (..., N, 3)."""
        p2d = self.normalize(p2d)
        p2d, _ = self.undistort(p2d)
        return to_homogeneous(p2d)

    def calibration_matrix(self) -> jnp.ndarray:
        K = jnp.zeros(self.shape + (3, 3), dtype=self.dtype)
        K = K.at[..., 0, 0].set(self.f[..., 0])
        K = K.at[..., 1, 1].set(self.f[..., 1])
        K = K.at[..., 0, 2].set(self.c[..., 0])
        K = K.at[..., 1, 2].set(self.c[..., 1])
        K = K.at[..., 2, 2].set(1.0)
        return K

    def to_cameradict(self) -> dict:
        camera = {
            "model": "PINHOLE" if self.dist.shape[-1] == 0 else "OPENCV",
            "width": int(np.asarray(self.size)[..., 0]),
            "height": int(np.asarray(self.size)[..., 1]),
            "params": np.concatenate(
                [np.asarray(self.f), np.asarray(self.c), np.asarray(self.dist)], axis=-1
            ).tolist(),
        }
        return camera

    def __repr__(self):
        return f"Camera(shape={self.shape}, dist={self.dist.shape[-1]}, dtype={self.dtype})"


def unproject_depth(camera: Camera, p2d: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Lift pixel points with depths to camera-frame 3D points."""
    return camera.image2cam(p2d) * depth[..., None]
