"""DISK keypoint detector + descriptor (capability of reference
`models/extractors/disk_kornia.py:8-108`, which wraps kornia's DISK).

kornia is unavailable here, so the architecture is implemented natively: the
DISK U-Net (down [16,32,64,64,64] / up [64,64,64, D+1], PReLU gates) with a
1-channel detection heatmap + 128-d dense descriptors, decoded by NMS +
static top-k with masks. Weight layout kept close to the original for a
future converter (docstring: original code at github.com/cvlab-epfl/disk).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import sample_descriptors
from ...ops.nms import simple_nms, top_k_keypoints
from ..base_model import BaseModel


class ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME")(x)
        x = nn.PReLU()(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME")(x)
        x = nn.PReLU()(x)
        return x


class DiskUNet(nn.Module):
    down: tuple = (16, 32, 64, 64, 64)
    up: tuple = (64, 64, 64)
    out_channels: int = 129  # desc 128 + heatmap 1

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, ch in enumerate(self.down):
            x = ConvBlock(ch, name=f"down_{i}")(x)
            if i < len(self.down) - 1:
                skips.append(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i, ch in enumerate(self.up):
            skip = skips[-(i + 1)]
            B, H, W, C = skip.shape
            x = jax.image.resize(x, (B, H, W, x.shape[-1]), method="nearest")
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(ch, name=f"up_{i}")(x)
        x = nn.Conv(self.out_channels, (1, 1), name="head")(x)
        return x


class DISK(BaseModel):
    default_conf = {
        "descriptor_dim": 128,
        "nms_radius": 2,
        "max_num_keypoints": 2048,
        "force_num_keypoints": False,
        "detection_threshold": 0.0,
        "pad_if_not_divisible": True,
        "weights": None,
    }
    required_data_keys = ["image"]

    def setup(self):
        self.unet = DiskUNet(out_channels=self.conf.descriptor_dim + 1, name="unet")

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]
        B, H, W, C = image.shape
        if C == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        # pad to /16 for the U-Net
        ph = -H % 16
        pw = -W % 16
        if ph or pw:
            image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        out = self.unet(image)
        desc_map = out[..., : c.descriptor_dim][:, :H, :W]
        heatmap = out[..., -1][:, :H, :W]

        nmsed = simple_nms(heatmap, c.nms_radius)
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
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "keypoint_mask": valid,
            "descriptors": desc,
            "dense_descriptors": desc_map,
        }

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
