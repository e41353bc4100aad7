"""LoFTR dense detector-free matcher, TPU-native re-design.

The reference only wraps kornia's torch LoFTR for evaluation
(`models/matchers/kornia_loftr.py:7-66`); here the full model runs in JAX:
ResNet-FPN backbone (`backbones/resnet_fpn.py`), sinusoidal 2D position
encoding, 4x(self+cross) coarse transformer with LINEAR attention
(elu(x)+1 feature maps — O(N) in sequence length, MXU-friendly einsums),
dual-softmax coarse matching with mutual-max + confidence threshold, and
fine refinement: 5x5 windows from the 1/2-resolution map around each
coarse match, one self+cross fine layer, correlation soft-argmax for the
sub-pixel position in image 1.

TPU-first: everything is static-shape — exactly `max_num_matches` match
slots with a validity mask (the reference emits ragged lists); outputs
follow the wrapper's aligned-list contract (keypoints0/1 + arange
matches) so eval pipelines treat it like any sparse matcher.

Weight conversion from the official outdoor/indoor checkpoints:
`compat.torch_conversion.convert_loftr` (pending validation against real
weights — not downloadable in this environment).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet_fpn import ResNetFPN_8_2
from ..base_model import BaseModel


def sine_pos_encoding(h: int, w: int, dim: int) -> jnp.ndarray:
    """Official LoFTR PositionEncodingSine: (H, W, dim) with interleaved
    sin/cos over x and y at dim/4 frequencies each."""
    d4 = dim // 4
    # official: positions are 1-indexed (ones().cumsum()), and
    # div_term = exp(arange(0, d/2, 2) * (-log(10000) / (d/2)))
    #          = exp(-k * log(10000) / (d/4)) for k in range(d/4)
    ys = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :, None]
    div = jnp.exp(
        jnp.arange(d4, dtype=jnp.float32) * 2.0 * (-jnp.log(10000.0) / (dim // 2)))
    pe = jnp.zeros((h, w, dim), jnp.float32)
    pe = pe.at[..., 0::4].set(jnp.sin(xs * div) + 0 * ys)
    pe = pe.at[..., 1::4].set(jnp.cos(xs * div) + 0 * ys)
    pe = pe.at[..., 2::4].set(jnp.sin(ys * div) + 0 * xs)
    pe = pe.at[..., 3::4].set(jnp.cos(ys * div) + 0 * xs)
    return pe


def linear_attention(q, k, v, mask_q=None, mask_kv=None):
    """O(N) attention with feature map elu(x)+1 (official LoFTR
    LinearAttention). q/k/v: (B, N, H, D)."""
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    if mask_kv is not None:
        k = k * mask_kv[:, :, None, None]
        v = v * mask_kv[:, :, None, None]
    v_len = v.shape[1]
    v = v / v_len
    kv = jnp.einsum("bnhd,bnhe->bhde", k, v)
    z = 1.0 / (jnp.einsum("bnhd,bhd->bnh", q, k.sum(axis=1)) + 1e-6)
    out = jnp.einsum("bnhd,bhde,bnh->bnhe", q, kv, z) * v_len
    if mask_q is not None:
        out = out * mask_q[:, :, None, None, ]
    return out


class LoFTREncoderLayer(nn.Module):
    dim: int
    nhead: int

    @nn.compact
    def __call__(self, x, source, mask_x=None, mask_src=None):
        B, N, D = x.shape
        H = self.nhead
        Dh = D // H
        q = nn.Dense(D, use_bias=False, name="q_proj")(x).reshape(B, N, H, Dh)
        k = nn.Dense(D, use_bias=False, name="k_proj")(source).reshape(
            B, source.shape[1], H, Dh)
        v = nn.Dense(D, use_bias=False, name="v_proj")(source).reshape(
            B, source.shape[1], H, Dh)
        msg = linear_attention(q, k, v, mask_x, mask_src).reshape(B, N, D)
        # official layer: merge(message) -> norm1 -> mlp([x, message]) ->
        # norm2 -> residual (LoFTREncoderLayer.forward)
        msg = nn.Dense(D, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(name="norm1")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * D, use_bias=False, name="mlp_0")(y)
        y = nn.relu(y)
        y = nn.Dense(D, use_bias=False, name="mlp_1")(y)
        y = nn.LayerNorm(name="norm2")(y)
        return x + y


class LoFTR(BaseModel):
    default_conf = {
        "coarse_layers": 4,  # x (self + cross)
        "fine_layers": 1,
        "dim_coarse": 256,
        "dim_fine": 128,
        "nhead": 8,
        "temperature": 0.1,
        "match_threshold": 0.2,
        "border_rm": 2,  # coarse-cell border removal
        "max_num_matches": 1024,  # static match slots
        "fine_window": 5,
        "fine_concat_coarse": True,
        "weights": None,
        "trainable": False,
    }
    required_data_keys = ["view0", "view1"]

    def setup(self):
        c = self.conf
        self.backbone = ResNetFPN_8_2(name="backbone")
        self.coarse_layers_ = [
            LoFTREncoderLayer(c.dim_coarse, c.nhead, name=f"coarse_{i}")
            for i in range(2 * c.coarse_layers)
        ]
        self.fine_layers_ = [
            LoFTREncoderLayer(c.dim_fine, c.nhead, name=f"fine_{i}")
            for i in range(2 * c.fine_layers)
        ]
        if c.fine_concat_coarse:
            self.down_proj = nn.Dense(
                c.dim_fine, use_bias=True, name="down_proj")
            self.merge_feat = nn.Dense(
                c.dim_fine, use_bias=True, name="merge_feat")

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        img0 = data["view0"]["image"]
        img1 = data["view1"]["image"]
        if img0.shape[-1] == 3:
            w_ = jnp.asarray([0.299, 0.587, 0.114], img0.dtype)
            img0 = (img0 * w_).sum(-1, keepdims=True)
            img1 = (img1 * w_).sum(-1, keepdims=True)
        B = img0.shape[0]

        cf0, ff0 = self.backbone(img0, train=train)
        cf1, ff1 = self.backbone(img1, train=train)
        Hc0, Wc0 = cf0.shape[1:3]
        Hc1, Wc1 = cf1.shape[1:3]
        N0, N1 = Hc0 * Wc0, Hc1 * Wc1

        # the f32 sine tables must not upcast bf16 backbone features (the
        # add would otherwise promote every coarse transformer layer to f32)
        pe0 = sine_pos_encoding(Hc0, Wc0, c.dim_coarse)[None].astype(cf0.dtype)
        pe1 = sine_pos_encoding(Hc1, Wc1, c.dim_coarse)[None].astype(cf1.dtype)
        f0 = (cf0 + pe0).reshape(B, N0, c.dim_coarse)
        f1 = (cf1 + pe1).reshape(B, N1, c.dim_coarse)

        for i in range(c.coarse_layers):
            f0 = self.coarse_layers_[2 * i](f0, f0)
            f1 = self.coarse_layers_[2 * i](f1, f1)
            f0n = self.coarse_layers_[2 * i + 1](f0, f1)
            f1n = self.coarse_layers_[2 * i + 1](f1, f0)
            f0, f1 = f0n, f1n

        # dual-softmax coarse matching; official divides BOTH features by
        # C^0.5 (net 1/C) before the temperature, so converted official
        # weights keep the match_threshold semantics
        scale = 1.0 / c.dim_coarse
        sim = jnp.einsum(
            "bnd,bmd->bnm", f0 * scale, f1,
            preferred_element_type=jnp.float32) / c.temperature
        P = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)

        # border removal in coarse-cell space
        def border_mask(H, W, n):
            ys = jnp.arange(H)[:, None]
            xs = jnp.arange(W)[None, :]
            b = c.border_rm
            return ((ys >= b) & (ys < H - b) & (xs >= b) & (xs < W - b)
                    ).reshape(-1)

        P = P * border_mask(Hc0, Wc0, N0)[None, :, None]
        P = P * border_mask(Hc1, Wc1, N1)[None, None, :]

        # mutual max + threshold
        max1 = P.max(axis=2, keepdims=True)
        max0 = P.max(axis=1, keepdims=True)
        mutual = (P == max1) & (P == max0)
        conf_ok = P > c.match_threshold
        cand = jnp.where(mutual & conf_ok, P, 0.0)
        # one best j per i
        best_j = cand.argmax(axis=2)  # (B, N0)
        best_p = cand.max(axis=2)

        K = int(c.max_num_matches)
        scores, top_i = jax.lax.top_k(best_p, K)  # (B, K)
        top_j = jnp.take_along_axis(best_j, top_i, axis=1)
        valid = scores > 0

        # coarse pixel coords (cell centers at stride 8)
        def cell_xy(idx, W):
            return jnp.stack(
                [(idx % W).astype(jnp.float32),
                 (idx // W).astype(jnp.float32)], -1)

        kpts0 = (cell_xy(top_i, Wc0) + 0.5) * 8.0
        kpts1_c = (cell_xy(top_j, Wc1) + 0.5) * 8.0

        # ---- fine refinement ----
        W_f = int(c.fine_window)
        r = W_f // 2
        # windows in the 1/2-res fine maps around the coarse centers
        # (coarse cell center at fine-scale coords = idx * 4 + 2)
        def windows(fmap, idx, Wc):
            Hf, Wf_, Dv = fmap.shape[1:]
            pad = jnp.pad(
                fmap, ((0, 0), (r, r), (r, r), (0, 0)))

            def one(m, ii):
                cy = (ii // Wc) * 4 + 2
                cx = (ii % Wc) * 4 + 2
                return jax.lax.dynamic_slice(
                    m, (cy, cx, 0), (W_f, W_f, Dv))  # pad-shifted center

            return jax.vmap(lambda m, ix: jax.vmap(
                lambda ii: one(m, ii))(ix))(pad, idx)

        w0 = windows(ff0, top_i, Wc0).reshape(B * K, W_f * W_f, c.dim_fine)
        w1 = windows(ff1, top_j, Wc1).reshape(B * K, W_f * W_f, c.dim_fine)

        if c.fine_concat_coarse:
            cf0_sel = jnp.take_along_axis(
                f0, top_i[..., None], axis=1).reshape(B * K, 1, c.dim_coarse)
            cf1_sel = jnp.take_along_axis(
                f1, top_j[..., None], axis=1).reshape(B * K, 1, c.dim_coarse)
            cc = self.down_proj(
                jnp.concatenate([cf0_sel, cf1_sel], axis=0))  # (2BK, 1, Df)
            wcat = jnp.concatenate([w0, w1], axis=0)
            merged = self.merge_feat(
                jnp.concatenate(
                    [wcat, jnp.tile(cc, (1, W_f * W_f, 1))], axis=-1))
            w0, w1 = merged[: B * K], merged[B * K:]

        for i in range(c.fine_layers):
            w0 = self.fine_layers_[2 * i](w0, w0)
            w1 = self.fine_layers_[2 * i](w1, w1)
            w0n = self.fine_layers_[2 * i + 1](w0, w1)
            w1n = self.fine_layers_[2 * i + 1](w1, w0)
            w0, w1 = w0n, w1n

        # correlation of the center vector of w0 with all of w1 -> expected
        # sub-cell offset in image 1 (official FineMatching)
        center = w0[:, (W_f * W_f) // 2]  # (BK, D)
        heat = jnp.einsum(
            "bd,bnd->bn", center, w1,
            preferred_element_type=jnp.float32) / (c.dim_fine**0.5)
        prob = jax.nn.softmax(heat, axis=-1).reshape(-1, W_f, W_f)
        gy = jnp.arange(W_f, dtype=jnp.float32) - r
        ex = (prob.sum(1) * gy).sum(-1)
        ey = (prob.sum(2) * gy).sum(-1)
        # fine maps are at stride 2 -> offsets scale by 2 px
        off = jnp.stack([ex, ey], -1).reshape(B, K, 2) * 2.0
        kpts1 = kpts1_c + off

        arange = jnp.tile(jnp.arange(K)[None], (B, 1))
        matches = jnp.where(valid, arange, -1)
        scoresm = jnp.where(valid, scores, 0.0)
        return {
            "keypoints0": kpts0,
            "keypoints1": kpts1,
            "keypoint_scores0": scoresm,
            "keypoint_scores1": scoresm,
            "keypoint_mask0": valid,
            "keypoint_mask1": valid,
            "matches0": matches,
            "matches1": matches,
            "matching_scores0": scoresm,
            "matching_scores1": scoresm,
        }

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError("native LoFTR is eval-only (as in the reference)")
