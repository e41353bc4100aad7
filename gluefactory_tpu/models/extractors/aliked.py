"""ALIKED: deformable-conv keypoint detector + sparse deformable descriptor
head, native reimplementation (role of reference
`models/extractors/aliked.py:591-788`, which reimplements the official model
with torchvision's CUDA `deform_conv2d`).

Architecture (aliked-n16): ConvBlock(3->c1) -> ResBlock(c2)@1/2 ->
ResBlock(c3, dcn)@1/8 -> ResBlock(c4->dim, dcn)@1/32; multi-scale 1x1
aggregation upsampled (align_corners=True) + concatenated to a `dim`-d dense
feature map; score head convs + sigmoid; DKD keypoint decoding (iterated
NMS, top-k, temperature-0.1 soft-argmax sub-pixel refinement, bilinear score
resampling — reference `aliked.py:73-242`); SDDH descriptor head sampling M
deformable positions per keypoint (reference `aliked.py:458-589`).

Parameter layout mirrors the official checkpoints 1:1 so
`compat.convert_aliked` is a pure transpose; parity vs the executing torch
reference is tested in tests/test_torchref_parity.py.

TPU-native notes:
  - deformable conv = K*K bilinear gathers + einsum (`deform_conv2d`
    below) — XLA fuses the gathers; no custom CUDA needed;
  - static shapes: fixed max_num_keypoints + `keypoint_mask`;
  - keypoints are returned in the repo-wide COLMAP convention (+0.5); the
    reference emits array-index coords (`aliked.py:769`), i.e. ours - 0.5.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample_nd
from ...ops.nms import simple_nms, top_k_keypoints
from ..base_model import BaseModel

CFGS = {
    "aliked-t16": {"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64, "K": 3, "M": 16},
    "aliked-n16": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 16},
    "aliked-n16rot": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 16},
    "aliked-n32": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 32},
}


def resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True semantics (the reference's
    nn.Upsample mode, `aliked.py:694-705`): output index i samples input
    index i * (in-1)/(out-1). x: (B, H, W, C)."""
    B, H, W, C = x.shape

    def axis_weights(n_in, n_out):
        pos = jnp.arange(n_out, dtype=jnp.float32) * (
            (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        )
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        w1 = pos - i0
        return i0, i1, w1

    y0, y1, wy = axis_weights(H, out_h)
    x0, x1, wx = axis_weights(W, out_w)
    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]


def deform_conv2d(x, offsets, kernel, max_offset):
    """Deformable 3x3 convolution via bilinear gathers (torchvision
    `deform_conv2d` semantics: per-tap (dy, dx) offsets, zero padding).

    x (B, H, W, Cin); offsets (B, H, W, K*K*2) layout [y0, x0, y1, x1, ...];
    kernel (K, K, Cin, Cout); offsets are clamped to +-max_offset
    (reference `aliked.py:308-319`).
    """
    B, H, W, Cin = x.shape
    K = kernel.shape[0]
    offsets = jnp.clip(offsets, -max_offset, max_offset)
    taps = []
    base_y, base_x = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    idx = 0
    for ky in range(K):
        for kx in range(K):
            off = offsets[..., 2 * idx : 2 * idx + 2]  # (B, H, W, 2) [dy, dx]
            py = base_y[None] + (ky - K // 2) + off[..., 0]
            px = base_x[None] + (kx - K // 2) + off[..., 1]
            pts = jnp.stack([px + 0.5, py + 0.5], axis=-1).reshape(B, H * W, 2)
            sampled = grid_sample_nd(x, pts).reshape(B, H, W, Cin)
            taps.append(sampled)
            idx += 1
    stacked = jnp.stack(taps, axis=-2)  # (B, H, W, K*K, Cin)
    out = jnp.einsum(
        "bhwkc,kcd->bhwd",
        stacked,
        kernel.reshape(K * K, Cin, -1),
        preferred_element_type=jnp.float32,
    )
    return out


class DeformableConv(nn.Module):
    """DCNv2 block matching reference DeformableConv2d (`aliked.py:269-328`):
    a learned offset conv (with bias) + bias-free regular conv applied at
    the offset positions."""

    out_channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        K = self.kernel
        offsets = nn.Conv(
            2 * K * K, (K, K), padding="SAME",
            kernel_init=nn.initializers.zeros, name="offset_conv",
        )(x)
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K, K, x.shape[-1], self.out_channels),
        )
        max_offset = max(x.shape[1], x.shape[2]) / 4.0
        return deform_conv2d(x, offsets, w, max_offset)


class ConvBlock(nn.Module):
    out_channels: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(name):
            if self.conv_type == "dcn":
                return DeformableConv(self.out_channels, name=name)
            # reference get_conv: bias=False (aliked.py:330-346)
            return nn.Conv(
                self.out_channels, (3, 3), padding="SAME", use_bias=False, name=name
            )

        x = conv("conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.selu(x)
        x = conv("conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn2")(x)
        x = nn.selu(x)
        return x


class ResBlock(nn.Module):
    out_channels: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(name):
            if self.conv_type == "dcn":
                return DeformableConv(self.out_channels, name=name)
            return nn.Conv(
                self.out_channels, (3, 3), padding="SAME", use_bias=False, name=name
            )

        # the downsample projection DOES have a bias (plain nn.Conv2d,
        # reference aliked.py:661-699)
        identity = nn.Conv(self.out_channels, (1, 1), name="downsample")(x)
        y = conv("conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.selu(y)
        y = conv("conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        return nn.selu(y + identity)


class SDDH(nn.Module):
    """Sparse deformable descriptor head (reference `aliked.py:458-589`):
    a KxK patch around each keypoint predicts M sample offsets through a
    two-layer conv (valid KxK + 1x1); M features are sampled at the offset
    positions (align_corners=True bilinear), passed through a bias-free
    1x1 conv + selu, and aggregated with per-position (C, C) weights."""

    dim: int
    K: int = 3
    M: int = 16

    @nn.compact
    def __call__(self, fmap, kpts_idx):
        # fmap (B, H, W, C); kpts_idx (B, N, 2) ARRAY-INDEX coords (x, y)
        B, H, W, C = fmap.shape
        N = kpts_idx.shape[1]
        K, M = self.K, self.M
        max_offset = max(H, W) / 4.0

        # integer KxK patches: corner = floor(kpt) - K/2 + 1, clamped to
        # [0, size-1-K] (the reference's clamp max is size-1-K, not size-K:
        # aliked.py:31-33 — reproduced exactly)
        kpt_int = jnp.floor(kpts_idx).astype(jnp.int32)
        corner = kpt_int - K // 2  # floor(k - K/2 + 1) == k - K//2 for odd K
        cx = jnp.clip(corner[..., 0], 0, W - 1 - K)
        cy = jnp.clip(corner[..., 1], 0, H - 1 - K)
        offs = jnp.arange(K, dtype=jnp.int32)
        gy = cy[..., None, None] + offs[None, None, :, None]  # (B, N, K, 1)
        gx = cx[..., None, None] + offs[None, None, None, :]  # (B, N, 1, K)
        flat = fmap.reshape(B, H * W, C)
        lin = (gy * W + gx).reshape(B, N * K * K)
        patch = jnp.take_along_axis(flat, lin[..., None], axis=1)
        patch = patch.reshape(B * N, K, K, C)

        # offset estimation: valid KxK conv -> selu -> 1x1 conv, clamped
        out = nn.Conv(2 * M, (K, K), padding="VALID", name="offset_conv1")(patch)
        out = nn.selu(out)
        out = nn.Conv(2 * M, (1, 1), name="offset_conv2")(out)
        out = jnp.clip(out.reshape(B, N, 2 * M), -max_offset, max_offset)
        # channel layout: first M are x-offsets, last M are y-offsets
        # (reference view(N, 2, M).permute, aliked.py:548-552)
        offset = jnp.stack([out[..., :M], out[..., M:]], axis=-1)  # (B, N, M, 2)

        # sample at the FLOAT keypoint + offset with align_corners=True
        # (= array index); only the patch extraction above floors
        # (reference aliked.py:527-560)
        pos = kpts_idx[:, :, None, :] + offset
        feats = grid_sample_nd(fmap, (pos + 0.5).reshape(B, N * M, 2))
        feats = feats.reshape(B, N, M, C)

        sf = nn.Dense(C, use_bias=False, name="sf_conv")
        feats = nn.selu(sf(feats))
        agg = self.param(
            "agg_weights", nn.initializers.uniform(1.0), (M, C, self.dim)
        )
        desc = jnp.einsum(
            "bnmc,mcd->bnd", feats, agg, preferred_element_type=jnp.float32
        )
        return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)


class ALIKED(BaseModel):
    default_conf = {
        "model_name": "aliked-n16",
        "max_num_keypoints": 2048,
        "detection_threshold": 0.2,
        "force_num_keypoints": False,
        "nms_radius": 2,
    }
    required_data_keys = ["image"]

    def setup(self):
        cfg = CFGS[self.conf.model_name]
        self.cfg = cfg
        self.block1 = ConvBlock(cfg["c1"], "conv", name="block1")
        self.block2 = ResBlock(cfg["c2"], "conv", name="block2")
        self.block3 = ResBlock(cfg["c3"], "dcn", name="block3")
        self.block4 = ResBlock(cfg["dim"], "dcn", name="block4")
        d4 = cfg["dim"] // 4
        conv1x1 = lambda name: nn.Conv(d4, (1, 1), use_bias=False, name=name)
        self.conv1 = conv1x1("conv1")
        self.conv2 = conv1x1("conv2")
        self.conv3 = conv1x1("conv3")
        self.conv4 = conv1x1("conv4")
        # reference score_head: resnet conv1x1/conv3x3, all bias-free
        self.score_conv1 = nn.Conv(8, (1, 1), use_bias=False, name="score_conv1")
        self.score_conv2 = nn.Conv(
            4, (3, 3), padding="SAME", use_bias=False, name="score_conv2"
        )
        self.score_conv3 = nn.Conv(
            4, (3, 3), padding="SAME", use_bias=False, name="score_conv3"
        )
        self.score_conv4 = nn.Conv(
            1, (3, 3), padding="SAME", use_bias=False, name="score_conv4"
        )
        self.desc_head = SDDH(cfg["dim"], cfg["K"], cfg["M"], name="desc_head")

    def extract_dense_map(self, image, train: bool = False):
        B, H, W, C = image.shape
        if C == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        # reference InputPadder: replicate padding to a multiple of 32,
        # split before/after (aliked.py:244-266)
        ph, pw = -H % 32, -W % 32
        t, l = ph // 2, pw // 2
        if ph or pw:
            image = jnp.pad(
                image, ((0, 0), (t, ph - t), (l, pw - l), (0, 0)), mode="edge"
            )
        x1 = self.block1(image, train)
        x2 = self.block2(nn.avg_pool(x1, (2, 2), strides=(2, 2)), train)
        x3 = self.block3(nn.avg_pool(x2, (4, 4), strides=(4, 4)), train)
        x4 = self.block4(nn.avg_pool(x3, (4, 4), strides=(4, 4)), train)
        f1 = nn.selu(self.conv1(x1))
        f2 = nn.selu(self.conv2(x2))
        f3 = nn.selu(self.conv3(x3))
        f4 = nn.selu(self.conv4(x4))
        Hp, Wp = image.shape[1:3]
        up = lambda fx: resize_align_corners(fx, Hp, Wp)
        fmap = jnp.concatenate([f1, up(f2), up(f3), up(f4)], axis=-1)
        score = self.score_conv1(fmap)
        score = nn.selu(score)
        score = nn.selu(self.score_conv2(score))
        score = nn.selu(self.score_conv3(score))
        score = jax.nn.sigmoid(self.score_conv4(score))[..., 0]
        fmap = fmap / (jnp.linalg.norm(fmap, axis=-1, keepdims=True) + 1e-12)
        return fmap[:, t : t + H, l : l + W], score[:, t : t + H, l : l + W]

    def _dkd_refine(self, kpts_int_idx, score_map):
        """DKD soft-argmax sub-pixel refinement (reference `aliked.py:164-215`):
        temperature-0.1 softmax over the (2r+1)^2 window of the RAW score
        map; returns (refined array-index kpts, resampled scores,
        dispersity). kpts_int_idx: (B, N, 2) integer array-index coords."""
        r = int(self.conf.nms_radius)
        B, H, W = score_map.shape
        N = kpts_int_idx.shape[1]
        d = 2 * r + 1
        offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
        gy = kpts_int_idx[..., 1][..., None, None] + offs[None, None, :, None]
        gx = kpts_int_idx[..., 0][..., None, None] + offs[None, None, None, :]
        # zero padding outside (reference nn.Unfold default)
        valid = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
        lin = (jnp.clip(gy, 0, H - 1) * W + jnp.clip(gx, 0, W - 1)).reshape(B, N * d * d)
        patch = jnp.take_along_axis(score_map.reshape(B, H * W), lin, axis=1)
        patch = (patch.reshape(B, N, d, d) * valid).reshape(B, N, d * d)
        x_exp = jnp.exp((patch - patch.max(-1, keepdims=True)) / 0.1)
        grid_x = jnp.tile(offs.astype(jnp.float32)[None, :], (d, 1)).reshape(-1)
        grid_y = jnp.tile(offs.astype(jnp.float32)[:, None], (1, d)).reshape(-1)
        denom = x_exp.sum(-1)
        rx = (x_exp @ grid_x) / denom
        ry = (x_exp @ grid_y) / denom
        residual = jnp.stack([rx, ry], axis=-1)  # (B, N, 2)
        dist2 = (
            (grid_x[None, None, :] - rx[..., None]) ** 2
            + (grid_y[None, None, :] - ry[..., None]) ** 2
        ) / (r * r)
        dispersity = (x_exp * dist2).sum(-1) / denom
        refined = kpts_int_idx.astype(jnp.float32) + residual
        # resample the score bilinearly at the refined position
        # (align_corners=True == array-index sampling)
        kscore = grid_sample_nd(score_map[..., None], refined + 0.5)[..., 0]
        return refined, kscore, dispersity

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]
        B, H, W, _ = image.shape
        fmap, score_map = self.extract_dense_map(image, train)

        r = int(c.nms_radius)
        nmsed = simple_nms(score_map, r)
        # border removal (reference DKD: radius-wide margins, aliked.py:120-133)
        xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        true_size = data.get("image_size")
        if true_size is not None:
            wt = true_size[:, 0][:, None, None]
            ht = true_size[:, 1][:, None, None]
        else:
            wt, ht = float(W), float(H)
        in_area = (xs >= r) & (ys >= r) & (xs < wt - r) & (ys < ht - r)
        nmsed = jnp.where(in_area, nmsed, 0.0)

        k = int(c.max_num_keypoints)
        kpts, scores, valid = top_k_keypoints(nmsed, k, max(c.detection_threshold, 0.0))
        kpts_int = jnp.round(kpts - 0.5).astype(jnp.int32)  # COLMAP -> index
        refined, kscore, dispersity = self._dkd_refine(kpts_int, score_map)
        kpts = refined + 0.5  # back to the repo-wide COLMAP convention
        scores = jnp.where(valid, kscore, 0.0)
        if c.force_num_keypoints:
            rng = self.make_rng("sample")
            size = true_size
            if size is None:
                size = jnp.tile(jnp.asarray([[W, H]], jnp.float32), (B, 1))
            u = jax.random.uniform(rng, (B, k, 2), dtype=kpts.dtype)
            kpts = jnp.where(valid[..., None], kpts, u * size[:, None, :])
            valid = jnp.ones_like(valid)
        desc = self.desc_head(fmap, kpts - 0.5)
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "keypoint_mask": valid,
            "descriptors": desc,
            "score_dispersity": dispersity,
            "score_map": score_map,
        }

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
