"""ALIKED: deformable-conv keypoint detector + sparse deformable descriptor
head, native reimplementation (role of reference
`models/extractors/aliked.py:591-788`, which reimplements the official model
with torchvision's CUDA `deform_conv2d`).

Architecture (aliked-n16): ConvBlock(3->c1) -> ResBlock(c2)@1/2 ->
ResBlock(c3, dcn)@1/8 -> ResBlock(c4->dim, dcn)@1/32; multi-scale 1x1
aggregation upsampled + concatenated to a `dim`-d dense feature map; score
head convs + sigmoid; DKD keypoint decoding (NMS, top-k, soft-argmax
sub-pixel refinement); SDDH descriptor head sampling M deformable positions
per keypoint.

TPU-native notes:
  - deformable conv = K*K bilinear gathers + einsum (`deform_conv2d`
    below) — XLA fuses the gathers; no custom CUDA needed;
  - static shapes: fixed max_num_keypoints + mask;
  - upsampling uses half-pixel `jax.image.resize` (the reference uses
    align_corners=True; this 0.5-px difference matters only for bit-exact
    weight-converted inference and is noted for the converter pass).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample_nd
from ...ops.nms import simple_nms, soft_argmax_refinement, top_k_keypoints
from ..base_model import BaseModel

CFGS = {
    "aliked-t16": {"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64, "K": 3, "M": 16},
    "aliked-n16": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 16},
    "aliked-n16rot": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 16},
    "aliked-n32": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128, "K": 3, "M": 32},
}


def deform_conv2d(x, offsets, kernel, bias=None):
    """Deformable 3x3 convolution via bilinear gathers.

    x (B, H, W, Cin); offsets (B, H, W, K*K*2); kernel (K, K, Cin, Cout).
    Each output position samples the K*K tap locations displaced by the
    predicted offsets and contracts with the kernel.
    """
    B, H, W, Cin = x.shape
    K = kernel.shape[0]
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
    if bias is not None:
        out = out + bias
    return out


class DeformableConv(nn.Module):
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
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return deform_conv2d(x, offsets, w, b)


class ConvBlock(nn.Module):
    out_channels: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(name):
            if self.conv_type == "dcn":
                return DeformableConv(self.out_channels, name=name)
            return nn.Conv(self.out_channels, (3, 3), padding="SAME", name=name)

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
            return nn.Conv(self.out_channels, (3, 3), padding="SAME", name=name)

        identity = nn.Conv(self.out_channels, (1, 1), name="downsample")(x)
        y = conv("conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.selu(y)
        y = conv("conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        return nn.selu(y + identity)


class SDDH(nn.Module):
    """Sparse deformable descriptor head: per keypoint, predict M sample
    offsets from the local feature, gather M features, aggregate
    (reference `aliked.py:458-589`)."""

    dim: int
    K: int = 3
    M: int = 16

    @nn.compact
    def __call__(self, fmap, kpts):
        # fmap (B, H, W, D); kpts (B, N, 2) pixel coords
        B, H, W, D = fmap.shape
        N = kpts.shape[1]
        # local KxK patch around each keypoint -> offset estimation
        offs = jnp.arange(-(self.K // 2), self.K // 2 + 1, dtype=jnp.float32)
        dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
        patch_offsets = jnp.stack([dx.ravel(), dy.ravel()], -1)  # (K*K, 2)
        pts = kpts[:, :, None, :] + patch_offsets[None, None]  # (B, N, K*K, 2)
        patch = grid_sample_nd(fmap, pts.reshape(B, N * self.K * self.K, 2))
        patch = patch.reshape(B, N, self.K * self.K * D)
        offset_pred = nn.Dense(2 * self.M, name="offset_mlp")(nn.selu(patch))
        offset_pred = offset_pred.reshape(B, N, self.M, 2)
        sample_pts = kpts[:, :, None, :] + offset_pred  # (B, N, M, 2)
        feats = grid_sample_nd(fmap, sample_pts.reshape(B, N * self.M, 2))
        feats = feats.reshape(B, N, self.M * D)
        desc = nn.Dense(self.dim, use_bias=False, name="agg")(feats)
        return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)


class ALIKED(BaseModel):
    default_conf = {
        "model_name": "aliked-n16",
        "max_num_keypoints": 2048,
        "detection_threshold": 0.2,
        "force_num_keypoints": False,
        "nms_radius": 2,
        "refinement_radius": 2,
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
        self.conv1 = nn.Conv(d4, (1, 1), name="conv1")
        self.conv2 = nn.Conv(d4, (1, 1), name="conv2")
        self.conv3 = nn.Conv(d4, (1, 1), name="conv3")
        self.conv4 = nn.Conv(d4, (1, 1), name="conv4")
        self.score_conv1 = nn.Conv(8, (1, 1), name="score_conv1")
        self.score_conv2 = nn.Conv(4, (3, 3), padding="SAME", name="score_conv2")
        self.score_conv3 = nn.Conv(4, (3, 3), padding="SAME", name="score_conv3")
        self.score_conv4 = nn.Conv(1, (3, 3), padding="SAME", name="score_conv4")
        self.desc_head = SDDH(cfg["dim"], cfg["K"], cfg["M"], name="desc_head")

    def extract_dense_map(self, image, train: bool = False):
        B, H, W, C = image.shape
        if C == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        ph, pw = -H % 32, -W % 32
        if ph or pw:
            image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x1 = self.block1(image, train)
        x2 = self.block2(nn.avg_pool(x1, (2, 2), strides=(2, 2)), train)
        x3 = self.block3(nn.avg_pool(x2, (4, 4), strides=(4, 4)), train)
        x4 = self.block4(nn.avg_pool(x3, (4, 4), strides=(4, 4)), train)
        f1 = nn.selu(self.conv1(x1))
        f2 = nn.selu(self.conv2(x2))
        f3 = nn.selu(self.conv3(x3))
        f4 = nn.selu(self.conv4(x4))
        Hp, Wp = image.shape[1:3]
        up = lambda t: jax.image.resize(t, (B, Hp, Wp, t.shape[-1]), method="linear")
        fmap = jnp.concatenate([f1, up(f2), up(f3), up(f4)], axis=-1)
        score = self.score_conv1(fmap)
        score = nn.selu(score)
        score = nn.selu(self.score_conv2(score))
        score = nn.selu(self.score_conv3(score))
        score = jax.nn.sigmoid(self.score_conv4(score))[..., 0]
        fmap = fmap / (jnp.linalg.norm(fmap, axis=-1, keepdims=True) + 1e-8)
        return fmap[:, :H, :W], score[:, :H, :W]

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]
        B, H, W, _ = image.shape
        fmap, score_map = self.extract_dense_map(image, train)

        nmsed = simple_nms(score_map, c.nms_radius)
        true_size = data.get("image_size")
        if true_size is not None:
            xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
            ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
            in_area = (xs < true_size[:, 0][:, None, None]) & (
                ys < true_size[:, 1][:, None, None]
            )
            nmsed = jnp.where(in_area, nmsed, 0.0)
        k = int(c.max_num_keypoints)
        kpts, scores, valid = top_k_keypoints(nmsed, k, max(c.detection_threshold, 0.0))
        # DKD sub-pixel refinement (soft-argmax in a local window)
        kpts = soft_argmax_refinement(kpts, score_map, c.refinement_radius)
        if c.force_num_keypoints:
            rng = self.make_rng("sample")
            size = true_size
            if size is None:
                size = jnp.tile(jnp.asarray([[W, H]], jnp.float32), (B, 1))
            u = jax.random.uniform(rng, (B, k, 2), dtype=kpts.dtype)
            kpts = jnp.where(valid[..., None], kpts, u * size[:, None, :])
            valid = jnp.ones_like(valid)
        desc = self.desc_head(fmap, kpts)
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "keypoint_mask": valid,
            "descriptors": desc,
            "score_map": score_map,
        }

    def loss(self, pred, data):
        raise NotImplementedError
