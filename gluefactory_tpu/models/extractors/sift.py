"""SIFT extractor with OpenCV backend (role of reference
`models/extractors/sift.py:80-234`).

DoG detection is host-side (OpenCV, via `jax.pure_callback` with static
shapes): RootSIFT normalization, duplicate/NMS filtering of DoG points,
outputs include `scales` and `oris` (consumed by LightGlue's
`add_scale_ori`). The pycolmap/CUDA backends of the reference map to this
single host backend; descriptor post-processing is identical.
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel


def run_opencv_sift(sift, image_u8: np.ndarray, n_kp: int):
    """Detect + describe on one uint8 grayscale image."""
    detections, descriptors = sift.detectAndCompute(image_u8, None)
    points = np.array([k.pt for k in detections], np.float32).reshape(-1, 2)
    scores = np.array([k.response for k in detections], np.float32)
    scales = np.array([k.size for k in detections], np.float32)
    angles = np.deg2rad(np.array([k.angle for k in detections], np.float32))
    if descriptors is None:
        descriptors = np.zeros((0, 128), np.float32)
    return points, scores, scales, angles, descriptors


def filter_dog_points(points, scales, angles, image_shape, nms_radius, scores):
    """Remove duplicate DoG detections (multiple orientations at the same
    point keep the strongest) — behavioral spec from reference `sift.py:18-51`."""
    h, w = image_shape
    ij = np.round(points - 0.5).astype(int).T[::-1]
    # remove duplicate points (identical coordinates)
    flat = np.ravel_multi_index(np.clip(ij, 0, [[h - 1], [w - 1]]), (h, w))
    _, unique_idx = np.unique(flat, return_index=True)
    keep = np.zeros(len(points), bool)
    keep[unique_idx] = True
    # keep strongest per NMS cell
    if nms_radius > 0:
        cell = np.ravel_multi_index(
            np.clip(ij // max(int(nms_radius), 1), 0, None),
            (h // max(int(nms_radius), 1) + 1, w // max(int(nms_radius), 1) + 1),
        )
        order = np.argsort(-scores)
        seen = set()
        nms_keep = np.zeros(len(points), bool)
        for i in order:
            c = cell[i]
            if c not in seen:
                seen.add(c)
                nms_keep[i] = True
        keep &= nms_keep
    return keep


def extract_sift_host(
    images: np.ndarray,
    max_kpts: int,
    detection_threshold: float,
    nms_radius: int,
    rootsift: bool,
):
    B, H, W, C = images.shape
    K = max_kpts
    out_kpts = np.zeros((B, K, 2), np.float32)
    out_scores = np.zeros((B, K), np.float32)
    out_scales = np.zeros((B, K), np.float32)
    out_oris = np.zeros((B, K), np.float32)
    out_desc = np.zeros((B, K, 128), np.float32)
    out_valid = np.zeros((B, K), bool)
    sift = cv2.SIFT_create(contrastThreshold=detection_threshold)
    for b in range(B):
        img = images[b]
        if C == 3:
            gray = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        else:
            gray = (img[..., 0] * 255).astype(np.uint8)
        pts, scores, scales, angles, desc = run_opencv_sift(sift, gray, K)
        if len(pts) == 0:
            continue
        keep = filter_dog_points(pts, scales, angles, (H, W), nms_radius, scores)
        pts, scores, scales, angles, desc = (
            pts[keep], scores[keep], scales[keep], angles[keep], desc[keep]
        )
        order = np.argsort(-scores)[:K]
        n = len(order)
        if rootsift:
            d = desc[order]
            d = d / np.maximum(np.abs(d).sum(-1, keepdims=True), 1e-8)
            d = np.sqrt(d)
        else:
            d = desc[order]
            d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        out_kpts[b, :n] = pts[order]
        out_scores[b, :n] = scores[order]
        out_scales[b, :n] = scales[order]
        out_oris[b, :n] = angles[order]
        out_desc[b, :n] = d
        out_valid[b, :n] = True
    return out_kpts, out_scores, out_scales, out_oris, out_desc, out_valid


class SIFT(BaseModel):
    default_conf = {
        # "opencv": host cv2 via pure_callback (reference behavior);
        # "jax": TPU-native DoG pipeline fully inside jit (ops/sift_jax.py)
        # — the reference's pycolmap/CUDA backends map onto these two.
        "backend": "opencv",
        "max_num_keypoints": 4096,
        "detection_threshold": 0.0066,
        "nms_radius": 0,
        "rootsift": True,
        "force_num_keypoints": False,
    }
    required_data_keys = ["image"]

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        B = image.shape[0]
        K = int(self.conf.max_num_keypoints)
        if self.conf.backend == "jax":
            return self._forward_jax(data, image, B, K)
        shapes = (
            jax.ShapeDtypeStruct((B, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.bool_),
        )
        kpts, scores, scales, oris, desc, valid = jax.pure_callback(
            lambda img: extract_sift_host(
                np.asarray(img),
                K,
                float(self.conf.detection_threshold),
                int(self.conf.nms_radius),
                bool(self.conf.rootsift),
            ),
            shapes,
            image,
        )
        if self.conf.force_num_keypoints:
            rng = self.make_rng("sample")
            size = data.get("image_size")
            if size is None:
                h, w = image.shape[1:3]
                size = jnp.tile(jnp.asarray([[w, h]], jnp.float32), (B, 1))
            u = jax.random.uniform(rng, (B, K, 2), dtype=kpts.dtype)
            kpts = jnp.where(valid[..., None], kpts, u * size[:, None, :])
            valid = jnp.ones_like(valid)
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "scales": scales,
            "oris": oris,
            "descriptors": desc,
            "keypoint_mask": valid,
        }

    def _forward_jax(self, data, image, B, K):
        """Device-side DoG SIFT (ops/sift_jax.py) — no host callback."""
        from ...ops.sift_jax import sift_detect

        gray = image
        if gray.shape[-1] == 3:
            w = jnp.asarray([0.299, 0.587, 0.114], gray.dtype)
            gray = (gray * w).sum(-1, keepdims=True)
        # same convention as cv2.SIFT_create(contrastThreshold=...): the
        # pipeline applies th/n_scales after interpolation, 0.5*th/n before
        out = sift_detect(
            gray[..., 0].astype(jnp.float32), K,
            contrast_thresh=max(float(self.conf.detection_threshold), 1e-4),
        )
        desc = out["descriptors"]
        if self.conf.rootsift:
            l1 = jnp.maximum(jnp.abs(desc).sum(-1, keepdims=True), 1e-8)
            desc = jnp.sqrt(jnp.abs(desc) / l1) * jnp.sign(desc)
        kpts, valid = out["keypoints"], out["keypoint_mask"]
        scores = jnp.where(valid, out["keypoint_scores"], 0.0)
        if self.conf.force_num_keypoints:
            rng = self.make_rng("sample")
            size = data.get("image_size")
            if size is None:
                h, w_ = image.shape[1:3]
                size = jnp.tile(jnp.asarray([[w_, h]], jnp.float32), (B, 1))
            u = jax.random.uniform(rng, (B, K, 2), dtype=kpts.dtype)
            kpts = jnp.where(valid[..., None], kpts, u * size[:, None, :])
            valid = jnp.ones_like(valid)
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "scales": out["scales"],
            "oris": out["oris"],
            "descriptors": desc,
            "keypoint_mask": valid,
        }

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
