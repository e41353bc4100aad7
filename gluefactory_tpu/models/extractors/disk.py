"""DISK keypoint detector + descriptor (capability of reference
`models/extractors/disk_kornia.py:8-108`, which wraps kornia's DISK).

kornia is unavailable here, so the architecture is implemented natively
following the original DISK (Tyszkiewicz et al., NeurIPS'20; code at
github.com/cvlab-epfl/disk, vendored by kornia under
`kornia/feature/disk/unet`): a "thin" U-Net — one pre-activated 5x5 conv
per block (InstanceNorm -> PReLU -> Conv), down channels [16,32,64,64,64]
with 2x2 average-pool between levels, nearest-neighbor upsampling and skip
concatenation on the way up with out channels [64,64,64,desc_dim+1]. The
final block's output is split into `desc_dim` dense descriptors + a
1-channel detection heatmap (kornia `DISK.heatmap_and_dense_descriptors`).
Keypoints are decoded by window NMS + static top-k with masks (kornia
`heatmap_to_keypoints` semantics; `nms_window_size` w maps to radius
(w-1)//2). Weights load via `compat.torch_conversion.convert_disk`
(layout reconstructed from the public kornia/unets sources — see its
docstring for per-field confidence).

Conf surface mirrors the reference wrapper (`disk_kornia.py:9-19`);
`chunk` is accepted for conf parity but unused (XLA batches whole arrays).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import sample_descriptors
from ...ops.nms import simple_nms, top_k_keypoints
from ..base_model import BaseModel


class ThinConvBlock(nn.Module):
    """Pre-activated single-conv block: InstanceNorm (no affine params,
    matching torch `InstanceNorm2d(affine=False)`) -> PReLU -> 5x5 conv.
    `first=True` skips the pre-activation (the image block in `unets`).

    Submodule names `gate`/`conv` line up with the torch Sequential indices
    documented in `convert_disk`.
    """

    out_channels: int
    first: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.first:
            # InstanceNorm2d: per-sample, per-channel spatial normalization
            mu = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            alpha = self.param(
                "gate", nn.initializers.constant(0.25), (x.shape[-1],)
            )
            x = jnp.where(x >= 0, x, alpha * x)  # PReLU(C_in)
        x = nn.Conv(self.out_channels, (5, 5), padding="SAME", name="conv")(x)
        return x


class DiskUNet(nn.Module):
    """Thin U-Net (unets `ThinUnetDownBlock`/`ThinUnetUpBlock`): avg-pool
    downsampling, nearest upsampling, one conv block per level."""

    down: tuple = (16, 32, 64, 64, 64)
    up: tuple = (64, 64, 64)
    out_channels: int = 129  # desc 128 + heatmap 1

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, ch in enumerate(self.down):
            if i > 0:
                skips.append(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = ThinConvBlock(ch, first=i == 0, name=f"down_{i}")(x)
        up = tuple(self.up) + (self.out_channels,)
        for i, ch in enumerate(up):
            skip = skips[-(i + 1)]
            B, H, W, _ = skip.shape
            x = jax.image.resize(x, (B, H, W, x.shape[-1]), method="nearest")
            x = jnp.concatenate([x, skip], axis=-1)
            x = ThinConvBlock(ch, name=f"up_{i}")(x)
        return x


class DISK(BaseModel):
    default_conf = {
        # reference wrapper surface (disk_kornia.py:9-19)
        "weights": None,  # "depth" once converted weights are provided
        "dense_outputs": False,
        "max_num_keypoints": 2048,  # static top-k (ref default None = all)
        "desc_dim": 128,
        "nms_window_size": 5,
        "detection_threshold": 0.0,
        "force_num_keypoints": False,
        "pad_if_not_divisible": True,
        "chunk": 4,  # conf parity only; XLA processes the full batch
    }
    required_data_keys = ["image"]

    def setup(self):
        self.unet = DiskUNet(out_channels=self.conf.desc_dim + 1, name="unet")

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]
        B, H, W, C = image.shape
        if C == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        if c.pad_if_not_divisible:
            ph = -H % 16
            pw = -W % 16
            if ph or pw:
                image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        out = self.unet(image)
        desc_map = out[..., : c.desc_dim][:, :H, :W]
        heatmap = out[..., -1][:, :H, :W]

        # kornia heatmap_to_keypoints: window NMS + threshold + top-n
        radius = (int(c.nms_window_size) - 1) // 2
        nmsed = simple_nms(heatmap, radius)
        true_size = data.get("image_size")
        if true_size is not None:
            xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
            ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
            in_area = (xs < true_size[:, 0][:, None, None]) & (
                ys < true_size[:, 1][:, None, None]
            )
            nmsed = jnp.where(in_area, nmsed, -jnp.inf)
        k = int(c.max_num_keypoints)
        kpts, scores, valid = top_k_keypoints(
            jnp.where(jnp.isfinite(nmsed), nmsed, 0.0), k, c.detection_threshold
        )
        if c.force_num_keypoints:
            rng = self.make_rng("sample")
            size = data.get("image_size")
            if size is None:
                size = jnp.tile(jnp.asarray([[W, H]], jnp.float32), (B, 1))
            u = jax.random.uniform(rng, (B, k, 2), dtype=kpts.dtype)
            kpts = jnp.where(valid[..., None], kpts, u * size[:, None, :])
            valid = jnp.ones_like(valid)
        desc = sample_descriptors(kpts, desc_map, stride=1)
        pred = {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "keypoint_mask": valid,
            "descriptors": desc,
        }
        if c.dense_outputs:
            pred["dense_descriptors"] = desc_map
        return pred

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
