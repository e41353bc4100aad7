"""DINOv2 ViT patch-feature backbone (role of reference
`models/backbones/dinov2.py:7-30`): dense patch features + cls token.

Native flax ViT implementation; pretrained weights convert from the official
torch release (place locally, zero-egress) via a key-mapping analogous to
`compat/torch_conversion.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..base_model import BaseModel

VIT_CONFS = {
    "dinov2_vits14": {"embed_dim": 384, "depth": 12, "num_heads": 6},
    "dinov2_vitb14": {"embed_dim": 768, "depth": 12, "num_heads": 12},
    "dinov2_vitl14": {"embed_dim": 1024, "depth": 24, "num_heads": 16},
}


class ViTBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6)(x)
        y = nn.Dense(4 * self.dim)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class DinoV2(BaseModel):
    default_conf = {
        "weights": "dinov2_vits14",
        "patch_size": 14,
        "trainable": False,
    }
    required_data_keys = ["image"]

    def setup(self):
        cfg = VIT_CONFS[self.conf.weights]
        self.embed_dim = cfg["embed_dim"]
        self.patch_embed = nn.Conv(
            cfg["embed_dim"],
            (self.conf.patch_size, self.conf.patch_size),
            strides=(self.conf.patch_size, self.conf.patch_size),
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg["embed_dim"])
        )
        self.blocks = [
            ViTBlock(cfg["embed_dim"], cfg["num_heads"], name=f"block_{i}")
            for i in range(cfg["depth"])
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        B, H, W, C = image.shape
        if C == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        p = self.conf.patch_size
        ph, pw = (H // p), (W // p)
        x = self.patch_embed(image[:, : ph * p, : pw * p])
        x = x.reshape(B, ph * pw, self.embed_dim)
        cls = jnp.tile(self.cls_token, (B, 1, 1))
        x = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        features = x[:, 1:].reshape(B, ph, pw, self.embed_dim)
        return {"features": features, "global_descriptor": x[:, 0]}

    def loss(self, pred, data):
        raise NotImplementedError
