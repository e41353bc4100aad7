"""DINOv2 ViT patch-feature backbone (role of reference
`models/backbones/dinov2.py:7-30`): dense patch features + cls token.

Native flax implementation of the official DINOv2 ViT (facebookresearch/
dinov2) with the exact inference semantics the reference wrapper relies on:
`get_intermediate_layers(n=1, return_class_token=True, reshape=True)` — the
LAST block output with the final LayerNorm applied, split into the cls token
and the (B, ph, pw, D) patch-feature grid.

Architecture details matched to the official checkpoints:
  - patch embedding: 14x14/14 conv, then [cls] + optional register tokens
    prepended and learned position embeddings added (bicubically resized when
    the input grid differs from the pretraining grid, 518/14 = 37x37);
  - pre-norm transformer blocks with fused-QKV attention and LayerScale
    (ls1/ls2 gamma) on both residual branches; exact (erf) GELU in the MLP;
  - final LayerNorm (eps 1e-6 throughout).

Pretrained weights convert via `compat.torch_conversion.convert_dinov2`,
which accepts both the official torch-hub layout (`blocks.{i}.attn.qkv...`)
and the HuggingFace `Dinov2Model` layout; non-circular forward parity vs the
executing `transformers.Dinov2Model` is pinned in
`tests/test_torchref_parity.py`.

Like the reference wrapper, no ImageNet normalization is applied here — the
caller feeds [0,1] images exactly as the reference does
(reference `models/backbones/dinov2.py:17-21`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..base_model import BaseModel

VIT_CONFS = {
    "dinov2_vits14": {"embed_dim": 384, "depth": 12, "num_heads": 6},
    "dinov2_vitb14": {"embed_dim": 768, "depth": 12, "num_heads": 12},
    "dinov2_vitl14": {"embed_dim": 1024, "depth": 24, "num_heads": 16},
    # NOTE: dinov2_vitg14 is NOT offered: the giant variant uses a SwiGLU
    # FFN (mlp.w12/mlp.w3), a different block function than the fc1/fc2 MLP
    # implemented here — silently converting it would be wrong.
}


def _cubic_kernel(x: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """torch's bicubic convolution kernel (a = -0.75)."""
    ax = jnp.abs(x)
    w1 = (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
    w2 = a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _bicubic_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """(n_out, n_in) row-stochastic matrix reproducing
    `torch.nn.functional.interpolate(mode='bicubic', align_corners=False,
    antialias=False)` exactly (the official DINOv2 interpolate_pos_encoding
    settings): src = (i + 0.5) * in/out - 0.5, 4 taps around floor(src),
    border-replicated indices."""
    scale = n_in / n_out
    src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale - 0.5
    base = jnp.floor(src)
    taps = base[:, None] + jnp.arange(-1, 3, dtype=jnp.float32)[None, :]
    wgt = _cubic_kernel(src[:, None] - taps)  # (n_out, 4)
    idx = jnp.clip(taps, 0, n_in - 1).astype(jnp.int32)
    mat = jnp.zeros((n_out, n_in), jnp.float32)
    for k in range(4):
        mat = mat.at[jnp.arange(n_out), idx[:, k]].add(wgt[:, k])
    return mat


class ViTBlock(nn.Module):
    """Pre-norm block with LayerScale, official DINOv2 layout.

    Fused QKV packs output channels as [q; k; v], each head-major — the same
    packing as the official `attn.qkv` Linear (reshape (B,N,3,H,Dh)).
    """

    dim: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        H = self.num_heads
        Dh = D // H

        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * D, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (Dh ** -0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, N, D)
        y = nn.Dense(D, name="proj")(y)
        ls1 = self.param("ls1", nn.initializers.constant(1e-5), (D,))
        x = x + ls1 * y

        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.mlp_ratio * D, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(D, name="fc2")(y)
        ls2 = self.param("ls2", nn.initializers.constant(1e-5), (D,))
        return x + ls2 * y


class DinoV2(BaseModel):
    default_conf = {
        "weights": "dinov2_vits14",
        "patch_size": 14,
        "img_size": 518,  # pretraining grid; pos_embed resizes for others
        "num_register_tokens": 0,  # 4 for the *_reg variants
        "allow_resize": False,  # reference :17-18 (round HW down to /14)
        "trainable": False,
        # override VIT_CONFS (e.g. tiny dims in tests); None = per `weights`
        "embed_dim": None,
        "depth": None,
        "num_heads": None,
    }
    required_data_keys = ["image"]

    def setup(self):
        cfg = dict(VIT_CONFS[self.conf.weights])
        for k in ("embed_dim", "depth", "num_heads"):
            if self.conf[k] is not None:
                cfg[k] = self.conf[k]
        self.embed_dim = cfg["embed_dim"]
        p = self.conf.patch_size
        self.grid0 = self.conf.img_size // p  # pretraining patch grid (37)
        self.patch_embed = nn.Conv(
            cfg["embed_dim"], (p, p), strides=(p, p), name="patch_embed"
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg["embed_dim"])
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + self.grid0 * self.grid0, cfg["embed_dim"]),
        )
        if self.conf.num_register_tokens:
            self.register_tokens = self.param(
                "register_tokens",
                nn.initializers.normal(0.02),
                (1, self.conf.num_register_tokens, cfg["embed_dim"]),
            )
        self.blocks = [
            ViTBlock(cfg["embed_dim"], cfg["num_heads"], name=f"block_{i}")
            for i in range(cfg["depth"])
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")

    def _interp_pos_embed(self, ph: int, pw: int) -> jnp.ndarray:
        """Official `interpolate_pos_encoding`: torch-exact bicubic resize
        (a=-0.75, align_corners=False, no antialias — `_bicubic_matrix`) of
        the patch grid; the cls position passes through unchanged."""
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:]
        if ph == self.grid0 and pw == self.grid0:
            return cls_pos, patch_pos
        g = self.grid0
        grid = patch_pos.reshape(g, g, self.embed_dim)
        wy = _bicubic_matrix(ph, g)
        wx = _bicubic_matrix(pw, g)
        grid = jnp.einsum("oi,ijd,pj->opd", wy, grid, wx)
        return cls_pos, grid.reshape(1, ph * pw, self.embed_dim)

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        B, H, W, C = image.shape
        if C == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        p = self.conf.patch_size
        ph, pw = (H // p), (W // p)
        if self.conf.allow_resize and (H % p or W % p):
            # reference :17-18: F.upsample(img, [h//14*14, w//14*14])
            # (legacy 'nearest': src index = floor(dst * in/out))
            iy = jnp.floor(
                jnp.arange(ph * p, dtype=jnp.float32) * (H / (ph * p))
            ).astype(jnp.int32)
            ix = jnp.floor(
                jnp.arange(pw * p, dtype=jnp.float32) * (W / (pw * p))
            ).astype(jnp.int32)
            image = image[:, iy][:, :, ix]
        x = self.patch_embed(image[:, : ph * p, : pw * p])
        x = x.reshape(B, ph * pw, self.embed_dim)
        cls_pos, patch_pos = self._interp_pos_embed(ph, pw)
        # the bicubic resize runs through f32 matrices; cast back so the
        # add does not upcast a bf16 ViT trunk to f32 (ROADMAP r4 perf log)
        x = x + patch_pos.astype(x.dtype)
        cls = jnp.tile(self.cls_token + cls_pos, (B, 1, 1))
        toks = [cls]
        if self.conf.num_register_tokens:
            toks.append(jnp.tile(self.register_tokens, (B, 1, 1)))
        x = jnp.concatenate(toks + [x], axis=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        n_prefix = 1 + self.conf.num_register_tokens
        features = x[:, n_prefix:].reshape(B, ph, pw, self.embed_dim)
        if not self.conf.trainable:
            features = jax.lax.stop_gradient(features)
            x = jax.lax.stop_gradient(x)
        return {
            "features": features,
            "global_descriptor": x[:, 0],
            # reference :26: flattened patch descriptors (B, N, D)
            "descriptors": x[:, n_prefix:],
        }

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
