"""Native RoMa dense-warp regression network, TPU-first.

Fills the network slot the reference outsources to the `romatch` pip package
(reference `models/matchers/roma.py:23-29,190-199` builds
`romatch.models.model_zoo.roma_models.roma_model` from downloaded weights;
the package is unavailable in this environment). The architecture follows the
RoMa paper (Edstedt et al., CVPR 2024, arXiv:2305.15404) and the published
model description:

  - **Coarse encoder**: frozen DINOv2 ViT-L/14 patch features (the repo's
    official-exact `models/backbones/dinov2.py`, converter + executing-torch
    parity already pinned), stored as the "16" pyramid level.
  - **Fine encoder**: VGG19-BN conv features, one map per scale
    {1, 2, 4, 8} taken just before each max-pool (channels 64/128/256/512),
    mirroring torchvision `vgg19_bn().features[:40]` so the official
    checkpoint maps 1:1 (flax module names carry the torchvision feature
    indices).
  - **Coarse matcher**: a Gaussian-Process regressor with a cosine kernel
    (T=0.2) over Fourier-embedded support coordinates
    (cos(8*pi*Conv1x1(grid))), posterior mean mu = K_xy (K_yy + 0.1 I)^-1 F,
    followed by a 5-block pre-norm ViT decoder over [mu ; proj(f_A)] tokens
    that classifies each coarse cell into a KxK anchor grid
    (regression-by-classification) plus a certainty logit; anchors are
    decoded to flow with a 5-neighbour soft-argmax around the mode.
  - **Refiners**: per-scale ConvRefiners (5x5 depthwise conv -> BN -> ReLU
    -> 1x1 conv stacks) consuming [f_A ; f_B warped ; displacement
    embedding ; local correlation], predicting (delta-flow, delta-certainty);
    flow deltas are normalized per the current map resolution and certainty
    accumulates across scales.

TPU-first choices: everything is NHWC, static-shape, batched; the two warp
directions run as one doubled batch (A->B and B->A share each image's
encoder pass exactly like the package's `forward_symmetric`); the GP solve
uses `jnp.linalg.solve` (Cholesky-free but batched and f32) instead of an
explicit inverse; local correlation is a gather + one einsum, fused by XLA.

Weight-layout caveat (same standing as DISK/KeyNet, see docs/weights.md):
the romatch checkpoint cannot be fetched or inspected here, so
`convert_roma` (compat/torch_conversion.py) targets the layout reconstructed
from the paper + torchvision naming and is structure-round-trip tested on a
fabricated state dict; validation against the real `roma_outdoor.pth` is
pending an environment that has it. All dims are conf-driven so tests run at
tiny sizes and a future converter can adapt mismatches without code changes.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.config import Config, merge
from ...ops.grid_sample import grid_sample_nd


# torchvision vgg19_bn `features` conv indices per block (the converter and
# the module names below both key on these).
VGG19_BLOCKS = (
    (64, (0, 3)),
    (128, (7, 10)),
    (256, (14, 17, 20, 23)),
    (512, (27, 30, 33, 36)),
)

NET_DEFAULT_CONF = {
    # coarse (scale-16 slot) encoder — the repo's DinoV2 backbone conf
    "dinov2": {
        "weights": "dinov2_vitl14",
        "trainable": False,
        "embed_dim": None,  # override for tiny tests
        "depth": None,
        "num_heads": None,
    },
    # fine encoder: [channels, n_convs] per VGG block (scales 1,2,4,8)
    "vgg_blocks": [[64, 2], [128, 2], [256, 4], [512, 4]],
    "gp_dim": 512,
    "gp_temperature": 0.2,
    "gp_sigma_noise": 0.1,
    "decoder_blocks": 5,
    "decoder_heads": 8,
    "anchor_res": 64,  # KxK regression-by-classification anchor grid
    # per-scale decoder hyperparameters
    "proj_dims": {"16": 512, "8": 512, "4": 256, "2": 64, "1": 9},
    "disp_emb_dims": {"16": 128, "8": 64, "4": 32, "2": 16, "1": 6},
    "corr_radius": {"16": 7, "8": 3, "4": 2, "2": None, "1": None},
    "hidden_blocks": 8,
    "kernel_size": 5,
    "detach_between_scales": True,
}


def _grid(h: int, w: int) -> jnp.ndarray:
    """(h, w, 2) [x, y] grid at linspace(-1 + 1/n, 1 - 1/n, n) — the package's
    coarse-coordinate convention (pixel centers, align_corners=False)."""
    ys = jnp.linspace(-1.0 + 1.0 / h, 1.0 - 1.0 / h, h)
    xs = jnp.linspace(-1.0 + 1.0 / w, 1.0 - 1.0 / w, w)
    return jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)


def _sample_normalized(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample fmap (B, H, W, C) at normalized [-1, 1] coords
    (B, ..., 2), torch grid_sample align_corners=False + zeros padding."""
    B, H, W, C = fmap.shape
    lead = coords.shape[:-1]
    pts = coords.reshape(B, -1, 2)
    pts = (pts + 1.0) / 2.0 * jnp.asarray([W, H], jnp.float32)
    out = grid_sample_nd(fmap, pts)
    return out.reshape(*lead, C)


def _resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear align_corners=False resize of (B, H, W, C) or (B, H, W)."""
    if x.ndim == 3:
        return jax.image.resize(x, (x.shape[0], h, w), method="linear")
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="linear")


def cls_to_flow_refine(logits: jnp.ndarray) -> jnp.ndarray:
    """Anchor classification -> flow: softmax over the K^2 anchors, then a
    soft-argmax over the mode and its 4 axis neighbours (the paper's
    "regression-by-classification with local refinement").

    logits: (B, H, W, K^2) -> flow (B, H, W, 2) in [-1, 1].
    """
    B, H, W, K2 = logits.shape
    res = int(round(math.sqrt(K2)))
    assert res * res == K2, f"anchor channels {K2} not a square"
    anchors = _grid(res, res).reshape(K2, 2)
    probs = jax.nn.softmax(logits, axis=-1)
    mode = jnp.argmax(probs, axis=-1)  # (B, H, W)
    nbr = jnp.stack(
        [mode - 1, mode, mode + 1, mode - res, mode + res], axis=-1
    )  # (B, H, W, 5)
    nbr = jnp.clip(nbr, 0, K2 - 1)
    p = jnp.take_along_axis(probs, nbr, axis=-1)  # (B, H, W, 5)
    coords = anchors[nbr]  # (B, H, W, 5, 2)
    return (p[..., None] * coords).sum(-2) / (p.sum(-1, keepdims=True) + 1e-8)


def local_correlation(
    f_a: jnp.ndarray, f_b: jnp.ndarray, radius: int, flow: jnp.ndarray
) -> jnp.ndarray:
    """Correlation of each f_a pixel with a (2r+1)^2 window of f_b sampled
    around the current flow estimate; window step = one f_b pixel in
    normalized units, products scaled by 1/sqrt(C).

    f_a, f_b: (B, H, W, C); flow: (B, H, W, 2) normalized. -> (B, H, W, K)
    """
    B, H, W, C = f_a.shape
    k = 2 * radius + 1
    oy = jnp.linspace(-2.0 * radius / H, 2.0 * radius / H, k)
    ox = jnp.linspace(-2.0 * radius / W, 2.0 * radius / W, k)
    offs = jnp.stack(jnp.meshgrid(ox, oy, indexing="xy"), axis=-1).reshape(-1, 2)
    coords = flow[:, :, :, None, :] + offs[None, None, None]  # (B,H,W,K,2)
    window = _sample_normalized(f_b, coords)  # (B, H, W, K, C)
    return jnp.einsum("bhwc,bhwkc->bhwk", f_a, window) / math.sqrt(C)


class VGG19Pyramid(nn.Module):
    """VGG19-BN fine-feature pyramid: the feature map just before each of the
    first four max-pools, keyed by its scale (1, 2, 4, 8). Module names carry
    the torchvision `features` index so the converter is mechanical."""

    blocks: Any  # ((channels, (torchvision conv indices...)), ...)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        feats = {}
        scale = 1
        for ch, idxs in self.blocks:
            for i in idxs:
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, name=f"bn{i}"
                )(x)
                x = nn.relu(x)
            feats[scale] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            scale *= 2
        return feats


class GPMatcher(nn.Module):
    """Cosine-kernel GP posterior mean over Fourier-embedded support
    coordinates (paper sec. 3.2; kernel K(x,y) = exp((cos(x,y) - 1)/T))."""

    gp_dim: int
    temperature: float = 0.2
    sigma_noise: float = 0.1

    def _kernel(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        c = jnp.einsum("bnd,bmd->bnm", x, y)
        nx = jnp.linalg.norm(x, axis=-1)
        ny = jnp.linalg.norm(y, axis=-1)
        c = c / (nx[:, :, None] * ny[:, None, :] + 1e-6)
        return jnp.exp((c - 1.0) / self.temperature)

    @nn.compact
    def __call__(self, f_a: jnp.ndarray, f_b: jnp.ndarray) -> jnp.ndarray:
        B, h1, w1, C = f_a.shape
        _, h2, w2, _ = f_b.shape
        pos_conv = nn.Conv(self.gp_dim, (1, 1), name="pos_conv")
        emb = jnp.cos(8.0 * jnp.pi * pos_conv(_grid(h2, w2)[None]))  # fourier
        x = f_a.reshape(B, h1 * w1, C).astype(jnp.float32)
        y = f_b.reshape(B, h2 * w2, C).astype(jnp.float32)
        f = jnp.tile(emb.reshape(1, h2 * w2, self.gp_dim), (B, 1, 1)).astype(
            jnp.float32
        )
        k_yy = self._kernel(y, y) + self.sigma_noise * jnp.eye(h2 * w2)[None]
        k_xy = self._kernel(x, y)
        mu = k_xy @ jnp.linalg.solve(k_yy, f)
        return mu.reshape(B, h1, w1, self.gp_dim).astype(f_a.dtype)


class _ViTBlock(nn.Module):
    """Plain pre-norm transformer block (MHA + 4x GELU MLP, no LayerScale —
    the package's decoder blocks use init_values=None)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn"
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * self.dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class AnchorDecoder(nn.Module):
    """ViT decoder over [gp_posterior ; projected coarse features] tokens ->
    per-cell anchor classification (K^2 channels) + certainty logit."""

    blocks: int
    heads: int
    anchor_res: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        for i in range(self.blocks):
            t = _ViTBlock(C, self.heads, name=f"block{i}")(t)
        out = nn.Dense(self.anchor_res**2 + 1, name="to_out")(t)
        out = out.reshape(B, H, W, -1)
        return out[..., :-1], out[..., -1]  # cls logits, certainty logit


class ConvRefiner(nn.Module):
    """Depthwise 5x5 refiner block stack predicting (delta-flow,
    delta-certainty) from [f_A ; f_B(warp) ; disp-emb ; local corr]."""

    disp_emb_dim: int
    corr_radius: int | None
    hidden_blocks: int
    kernel_size: int = 5

    def _block(self, x, out_dim, name, train):
        in_dim = x.shape[-1]
        # depthwise conv (groups = in_dim) -> BN -> relu -> 1x1 mixing conv
        x = nn.Conv(
            out_dim,
            (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2,
            feature_group_count=in_dim,
            name=f"{name}_dw",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name=f"{name}_bn"
        )(x)
        x = nn.relu(x)
        return nn.Conv(out_dim, (1, 1), name=f"{name}_pw")(x)

    @nn.compact
    def __call__(
        self,
        f_a: jnp.ndarray,
        f_b: jnp.ndarray,
        flow: jnp.ndarray,
        scale_factor: float = 1.0,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        B, H, W, C = f_a.shape
        b_warped = _sample_normalized(f_b, flow)
        disp = flow - _grid(H, W)[None]
        # the package scales displacement embeddings by 40/32 * scale_factor
        emb = nn.Conv(self.disp_emb_dim, (1, 1), name="disp_emb")(
            40.0 / 32.0 * scale_factor * disp
        )
        parts = [f_a, b_warped, emb]
        if self.corr_radius:
            parts.append(local_correlation(f_a, f_b, self.corr_radius, flow))
        d = jnp.concatenate(parts, axis=-1)
        hidden = d.shape[-1]
        d = self._block(d, hidden, "block1", train)
        for i in range(self.hidden_blocks):
            d = self._block(d, hidden, f"hidden{i}", train)
        d = nn.Conv(3, (1, 1), name="out_conv")(d.astype(jnp.float32))
        return d[..., :2], d[..., 2]


class RoMaDecoder(nn.Module):
    """Coarse-to-fine warp decoder over the feature pyramid (scales 16 ->
    1): GP + anchor decoder at the coarsest level, ConvRefiner at every
    level, bilinear flow/certainty propagation between levels."""

    conf: Config

    def setup(self):
        c = self.conf
        self.gp = GPMatcher(
            int(c.gp_dim), float(c.gp_temperature), float(c.gp_sigma_noise)
        )
        self.embedding_decoder = AnchorDecoder(
            int(c.decoder_blocks), int(c.decoder_heads), int(c.anchor_res)
        )
        projs = {}
        refiners = {}
        for s in ("16", "8", "4", "2", "1"):
            projs[s] = [
                nn.Conv(int(c.proj_dims[s]), (1, 1), name=f"proj{s}_conv"),
                nn.BatchNorm(momentum=0.9, name=f"proj{s}_bn"),
            ]
            refiners[s] = ConvRefiner(
                disp_emb_dim=int(c.disp_emb_dims[s]),
                corr_radius=(int(c.corr_radius[s]) if c.corr_radius[s] else None),
                hidden_blocks=int(c.hidden_blocks),
                kernel_size=int(c.kernel_size),
                name=f"refiner{s}",
            )
        self.projs = projs
        self.refiners = refiners

    def _proj(self, s: str, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        conv, bn = self.projs[s]
        return bn(conv(x), use_running_average=not train)

    def __call__(
        self,
        f_a: dict,
        f_b: dict,
        flow: jnp.ndarray | None = None,
        certainty: jnp.ndarray | None = None,
        upsample: bool = False,
        scale_factor: float = 1.0,
        train: bool = False,
    ) -> dict:
        scales = ["8", "4", "2", "1"] if upsample else ["16", "8", "4", "2", "1"]
        corresps: dict = {}
        for s in scales:
            ins = int(s)
            fa_s = self._proj(s, f_a[ins], train)
            fb_s = self._proj(s, f_b[ins], train)
            B, hs, ws, _ = fa_s.shape
            if flow is not None and flow.shape[1:3] != (hs, ws):
                flow = _resize(flow, hs, ws)
                certainty = _resize(certainty, hs, ws)
            if ins == 16:
                gp_post = self.gp(fa_s, fb_s)
                cls_logits, certainty = self.embedding_decoder(
                    jnp.concatenate([gp_post, fa_s], axis=-1)
                )
                flow = cls_to_flow_refine(cls_logits)
                corresps[ins] = {"gm_cls": cls_logits, "gm_certainty": certainty}
            delta_flow, delta_cert = self.refiners[s](
                fa_s, fb_s, flow, scale_factor=scale_factor, train=train
            )
            # delta is in units of the current map's pixels: normalize by the
            # map size (full [-1,1] span / map extent = scale/full-res size)
            flow = flow + delta_flow / jnp.asarray([ws, hs], jnp.float32)
            certainty = certainty + delta_cert
            corresps.setdefault(ins, {})
            corresps[ins].update({"flow": flow, "certainty": certainty})
            if s != scales[-1] and self.conf.detach_between_scales:
                flow = jax.lax.stop_gradient(flow)
                certainty = jax.lax.stop_gradient(certainty)
        return corresps


class RoMaNet(nn.Module):
    """Full RoMa regression matcher: encoders + decoder, symmetric two-pass
    protocol (coarse pass at `internal_hw`, optional refiner-only upsample
    pass at the output resolution), both warp directions in one doubled
    batch."""

    conf: Config

    @classmethod
    def from_conf(cls, conf=None) -> "RoMaNet":
        merged = merge(Config(NET_DEFAULT_CONF), conf or {}, strict=True)
        return cls(conf=merged)

    def setup(self):
        from ..backbones.dinov2 import DinoV2

        self.dinov2 = DinoV2.from_conf(self.conf.dinov2.to_dict())
        self.vgg = VGG19Pyramid(
            tuple(
                (int(ch), VGG19_BLOCKS[i][1][: int(n)])
                for i, (ch, n) in enumerate(self.conf.vgg_blocks)
            )
        )
        self.decoder = RoMaDecoder(self.conf)

    def extract_pyramid(
        self, image: jnp.ndarray, coarse: bool = True, train: bool = False
    ) -> dict:
        """image: (B, H, W, 3), ImageNet-normalized. Returns {scale: NHWC}."""
        feats = self.vgg(image, train=train)
        if coarse:
            feats[16] = self.dinov2({"image": image})["features"]
        return feats

    def __call__(
        self,
        im_a: jnp.ndarray,
        im_b: jnp.ndarray,
        flow: jnp.ndarray | None = None,
        certainty: jnp.ndarray | None = None,
        upsample: bool = False,
        scale_factor: float = 1.0,
        train: bool = False,
    ) -> dict:
        """Symmetric dense warp: returns corresps with doubled batch — the
        first half is A->B, the second B->A (chunk like the reference
        wrapper, `roma.py:330-334`)."""
        f_a = self.extract_pyramid(im_a, coarse=not upsample, train=train)
        f_b = self.extract_pyramid(im_b, coarse=not upsample, train=train)
        f_q = {s: jnp.concatenate([f_a[s], f_b[s]]) for s in f_a}
        f_s = {s: jnp.concatenate([f_b[s], f_a[s]]) for s in f_a}
        return self.decoder(
            f_q,
            f_s,
            flow=flow,
            certainty=certainty,
            upsample=upsample,
            scale_factor=scale_factor,
            train=train,
        )
