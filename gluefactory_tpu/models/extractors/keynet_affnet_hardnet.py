"""KeyNet + orientation + HardNet extractor, TPU-native.

Role of reference `models/extractors/keynet_affnet_hardnet.py:8-74`, which
wraps `kornia.feature.KeyNetHardNet` (KeyNet detector + LAF orienter +
HardNet descriptor — despite the filename, the reference does not use
AffNet). Here the full stack runs natively in JAX:

  - **KeyNet** (Barroso-Laguna et al., ICCV'19): 10 handcrafted
    derivative-based feature maps (gx, gy, gx^2, gy^2, gx*gy, gxx, gyy,
    gxy, gxx*gyy, gxy^2) + 3 learned 5x5 conv blocks (8 filters, BN+ReLU)
    over a 3-level downsampling pyramid, per-level maps upsampled and
    stacked, final 1x1 conv -> response map. Keypoints via the in-repo
    `simple_nms` + static top-k.
  - **Orientation**: dominant-gradient orientation on 32x32 patches
    (kornia `PatchDominantGradientOrientation` semantics: Gaussian-weighted
    gradient histogram peak).
  - **HardNet** (Mishchuk et al., NeurIPS'17): the canonical 7-conv
    patch descriptor (32-64-128 channels, BN without affine, final 8x8
    conv), on 32x32 patches resampled at the keypoint scale/orientation.

Weight converters for the kornia checkpoints are a round-2 item (no
weights downloadable here); architecture follows the papers, so converted
tensors slot in once validated. Outputs follow the reference wrapper:
keypoints/scales/oris/keypoint_scores/descriptors (+ masks, static K).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.nms import simple_nms, top_k_keypoints
from ..base_model import BaseModel


def spatial_gradient(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel-normalized first derivatives of (B, H, W, 1)."""
    kx = jnp.asarray(
        [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    ky = kx.T

    def conv(v, k):
        return jax.lax.conv_general_dilated(
            v, k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    return conv(x, kx), conv(x, ky)


def handcrafted_features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 1) -> (B, H, W, 10) KeyNet handcrafted block."""
    gx, gy = spatial_gradient(x)
    gxx, gxy = spatial_gradient(gx)
    _, gyy = spatial_gradient(gy)
    feats = [
        gx, gy, gx * gx, gy * gy, gx * gy,
        gxx, gyy, gxy, gxx * gyy, gxy * gxy,
    ]
    return jnp.concatenate(feats, axis=-1)


class KeyNetBlock(nn.Module):
    filters: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            x = nn.Conv(self.filters, (5, 5), padding="SAME",
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


def _pyrdown(x: jnp.ndarray, factor: float = 1.2) -> jnp.ndarray:
    """kornia `pyrdown(x, factor)` semantics: binomial 5-tap Gaussian blur
    then bilinear resize by 1/factor (KeyNet's scale pyramid uses 1.2, not
    octaves — kornia keynet.py forward)."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0

    def sep_conv(v, kern, axis):
        # kornia blurs with border_type="reflect": pad by the kernel half
        # width with edge-excluded reflection, then convolve VALID
        pad = [(0, 0)] * 4
        pad[axis] = (2, 2)
        v = jnp.pad(v, pad, mode="reflect")
        shape = [1, 1, 1, 1]
        shape[axis] = 5
        return jax.lax.conv_general_dilated(
            v, kern.reshape(shape[1:3] + [1, 1]), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = sep_conv(x, k, 1)
    x = sep_conv(x, k, 2)
    B, H, W, C = x.shape
    # kornia floors the output size (int(H / factor), not round)
    nh, nw = max(int(H / factor), 1), max(int(W / factor), 1)
    return jax.image.resize(x, (B, nh, nw, C), "bilinear")


class KeyNet(nn.Module):
    """Response map from the 3-level (factor-1.2) pyramid of
    handcrafted+learned maps (kornia `KeyNet.forward`: per-level shared
    feature extractor, upsample to base size, concat, 5x5 last conv)."""

    levels: int = 3
    filters: int = 8
    pyramid_factor: float = 1.2

    @nn.compact
    def __call__(self, img, train: bool = False):
        B, H, W, _ = img.shape
        block = KeyNetBlock(self.filters, name="block")  # shared weights
        feats = []
        x = img
        for lv in range(self.levels):
            f = block(handcrafted_features(x), train=train)
            if lv > 0:
                f = jax.image.resize(
                    f, (B, H, W, self.filters), "bilinear")
            feats.append(f)
            if lv + 1 < self.levels:
                x = _pyrdown(x, self.pyramid_factor)
        y = jnp.concatenate(feats, axis=-1)
        y = nn.Conv(1, (5, 5), padding="SAME", name="last_conv")(y)
        return nn.relu(y[..., 0])  # (B, H, W)


class HardNet(nn.Module):
    """Canonical HardNet: input (N, 32, 32, 1) normalized patches ->
    (N, 128) L2-normalized descriptors."""

    @nn.compact
    def __call__(self, p, train: bool = False):
        spec = [(32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1)]
        x = p
        for i, (ch, st) in enumerate(spec):
            x = nn.Conv(ch, (3, 3), strides=(st, st), padding="SAME",
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, use_bias=False, use_scale=False,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(128, (8, 8), padding="VALID", use_bias=False,
                    name="conv_final")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, use_bias=False, use_scale=False,
                         name="bn_final")(x)
        x = x.reshape(x.shape[0], -1)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def extract_patches(img, kpts, scales, oris, size: int = 32):
    """Bilinear 32x32 patches around kpts at the given scale/orientation.
    img (H, W); kpts (K, 2) xy; scales (K,) patch radius in px; oris (K,).
    """
    H, W = img.shape
    K = kpts.shape[0]
    g = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    gxx, gyy = jnp.meshgrid(g, g, indexing="xy")  # (-1, 1)
    cs, sn = jnp.cos(oris), jnp.sin(oris)
    px = (gxx[None] * cs[:, None, None] - gyy[None] * sn[:, None, None])
    py = (gxx[None] * sn[:, None, None] + gyy[None] * cs[:, None, None])
    # kpts are COLMAP (+0.5 centers); array-index coords subtract 0.5,
    # matching the repo-wide grid_sample_nd convention
    sx = kpts[:, 0, None, None] - 0.5 + px * scales[:, None, None]
    sy = kpts[:, 1, None, None] - 0.5 + py * scales[:, None, None]
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    flat = img.reshape(-1)

    def read(y, x):
        return flat[(y * W + x).reshape(-1)].reshape(K, size, size)

    v = (read(y0, x0) * (1 - fx) * (1 - fy)
         + read(y0, x0 + 1) * fx * (1 - fy)
         + read(y0 + 1, x0) * (1 - fx) * fy
         + read(y0 + 1, x0 + 1) * fx * fy)
    return v


def dominant_orientation(patches: jnp.ndarray) -> jnp.ndarray:
    """kornia PatchDominantGradientOrientation semantics: Gaussian-weighted
    36-bin gradient-orientation histogram peak with parabolic refinement.
    patches (K, S, S) -> theta (K,)."""
    K, S, _ = patches.shape
    gx = 0.5 * (patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2])
    gy = 0.5 * (patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1])
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    d = S - 2
    c = (d - 1) / 2.0
    ii = (jnp.arange(d, dtype=jnp.float32) - c) / (d / 2)
    w = jnp.exp(-(ii[None, :, None] ** 2 + ii[None, None, :] ** 2) / 0.5)
    wm = (mag * w).reshape(K, -1)
    bins = jnp.clip(
        jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36), 0, 35
    ).astype(jnp.int32).reshape(K, -1)
    hist = jnp.zeros((K, 36), jnp.float32).at[
        jnp.arange(K)[:, None], bins].add(wm)
    for _ in range(2):
        hist = (6 * hist + 4 * (jnp.roll(hist, 1, -1) + jnp.roll(hist, -1, -1))
                + jnp.roll(hist, 2, -1) + jnp.roll(hist, -2, -1)) / 16.0
    b = jnp.argmax(hist, -1)
    hb = jnp.take_along_axis(hist, b[:, None], -1)[:, 0]
    hl = jnp.take_along_axis(hist, ((b - 1) % 36)[:, None], -1)[:, 0]
    hr = jnp.take_along_axis(hist, ((b + 1) % 36)[:, None], -1)[:, 0]
    den = hl - 2 * hb + hr
    frac = jnp.where(jnp.abs(den) > 1e-8, 0.5 * (hl - hr) / den, 0.0)
    return (b.astype(jnp.float32) + 0.5 + frac) * (2 * jnp.pi / 36) - jnp.pi


class KeyNetAffNetHardNet(BaseModel):
    default_conf = {
        "max_num_keypoints": 2048,
        "nms_radius": 4,
        "detection_threshold": 0.0,
        "patch_scale": 12.0,  # patch radius in px at response scale
        "upright": False,  # True skips the orientation estimation
        "force_num_keypoints": False,
        "trainable": False,
    }
    required_data_keys = ["image"]

    def setup(self):
        self.keynet = KeyNet(name="keynet")
        self.hardnet = HardNet(name="hardnet")

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]
        if image.shape[-1] == 3:
            w = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = (image * w).sum(-1, keepdims=True)
        B = image.shape[0]
        K = int(c.max_num_keypoints)

        resp = self.keynet(image.astype(jnp.float32), train=train)
        nmsed = simple_nms(resp, int(c.nms_radius))
        kpts, scores, valid = top_k_keypoints(
            nmsed, K, float(c.detection_threshold),
            nms_radius=int(c.nms_radius))

        if c.force_num_keypoints:
            rng = self.make_rng("sample")
            size = data.get("image_size")
            if size is None:
                h, wd = image.shape[1:3]
                size = jnp.tile(jnp.asarray([[wd, h]], jnp.float32), (B, 1))
            u = jax.random.uniform(rng, (B, K, 2), dtype=kpts.dtype)
            kpts = jnp.where(valid[..., None], kpts, u * size[:, None, :])
            scores = jnp.where(valid, scores, 0.0)
            valid = jnp.ones_like(valid)

        scales = jnp.full((B, K), float(c.patch_scale), jnp.float32)
        gray = image[..., 0].astype(jnp.float32)

        def per_image(img1, kp, sc):
            if c.upright:
                theta = jnp.zeros(K, jnp.float32)
            else:
                up = extract_patches(img1, kp, sc, jnp.zeros(K), 32)
                theta = dominant_orientation(up)
            patches = extract_patches(img1, kp, sc, theta, 32)
            mu = patches.mean(axis=(1, 2), keepdims=True)
            sd = patches.std(axis=(1, 2), keepdims=True) + 1e-6
            return theta, (patches - mu) / sd

        oris, patches = jax.vmap(per_image)(gray, kpts, scales)
        desc = self.hardnet(
            patches.reshape(B * K, 32, 32, 1), train=train
        ).reshape(B, K, 128)
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "scales": scales,
            "oris": oris,
            "descriptors": desc,
            "keypoint_mask": valid,
        }

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError("eval-only, as in the reference wrapper")
