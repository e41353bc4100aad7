"""SuperPoint keypoint detector + descriptor, TPU-native.

Covers both reference variants through `conf.variant`:
  - "vanilla": the official MagicLeap architecture (VGG encoder without BN,
    65-channel detector softmax + 8x8 pixel shuffle, 256-d descriptors) —
    reference `gluefactory_nonfree/superpoint.py:52-356`; weights convertible
    from `superpoint_v1.pth` via `compat/torch_superpoint.py`.
  - "open": the MIT re-training (rpautrat), VGG blocks with BatchNorm —
    reference `models/extractors/superpoint_open.py:78-216`.

TPU-first deviations from the reference:
  - NHWC layout throughout (XLA's native conv layout on TPU).
  - Static shapes: always returns exactly `max_num_keypoints` keypoints with a
    boolean `keypoint_mask`; `force_num_keypoints` fills invalid slots with
    random in-image points (reference `superpoint.py:304-317`) so that they
    participate as real (low-score) keypoints during training.
  - Keypoints use the COLMAP corner convention (+0.5 offsets), matching
    `superpoint.py:342`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pallas_conv, pallas_detect
from ...ops.grid_sample import sample_descriptors
from ...ops.nms import remove_borders, simple_nms, top_k_keypoints
from ...ops.pallas_conv import fused_vgg_available, vgg_block
from ...ops.pallas_detect import detect_keypoints, fused_detect_available
from ..base_model import BaseModel


def rgb_to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 1), luminance weights."""
    if image.shape[-1] == 1:
        return image
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=image.dtype)
    return (image * w).sum(axis=-1, keepdims=True)


class VGGBlock(nn.Module):
    """conv (+BN) (+relu) block.

    The "open" variant reproduces the rpautrat ordering exactly —
    conv -> relu -> BN with eps=1e-3 (reference
    `models/extractors/superpoint_open.py:59-76`: Sequential(conv,
    activation, bn)) — via `bn_after_relu`."""

    out_channels: int
    kernel: int = 3
    relu: bool = True
    use_bn: bool = False
    bn_after_relu: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel), padding="SAME")(x)
        if self.use_bn and not self.bn_after_relu:
            x = nn.BatchNorm(
                use_running_average=not train, epsilon=self.bn_eps, momentum=0.9
            )(x)
        if self.relu:
            x = nn.relu(x)
        if self.use_bn and self.bn_after_relu:
            x = nn.BatchNorm(
                use_running_average=not train, epsilon=self.bn_eps, momentum=0.9
            )(x)
        return x


class SuperPoint(BaseModel):
    default_conf = {
        "variant": "vanilla",  # "vanilla" (no BN) | "open" (BN)
        "descriptor_dim": 256,
        "nms_radius": 4,
        "max_num_keypoints": 1024,  # static K (TPU requires fixed shapes)
        "max_num_keypoints_val": None,  # eval-time K override (ref :162)
        "force_num_keypoints": False,  # fill invalid slots with random kpts
        "randomize_keypoints_training": False,  # sample K by score (ref :90-94)
        "detection_threshold": 0.005,
        "remove_borders": 4,
        "refinement_radius": 0,  # soft-argmax sub-pixel (ref :97-113)
        "dense_outputs": False,
        "channels": [64, 64, 128, 128],
        "head_channels": 256,
        # Opt-in Pallas kernels (measured SLOWER than the XLA paths on v5e
        # at bench shapes — see ROADMAP "negative results"; kept as tested
        # infrastructure for future tuning): fused NMS+decode and fused
        # conv blocks (vanilla variant only — "open" interleaves BN).
        "fused_detect": False,
        "fused_backbone": False,
        # space-to-depth execution of block1 (conv1a+conv1b+pool at half
        # resolution, ops/s2d_conv.py) — exact arithmetic, MXU-friendlier
        # K dims (vanilla variant, even H/W only). MEASURED SLOWER
        # end-to-end on v5e (62.0 vs 70.0 pairs/s at bench shapes): the
        # 16/9 MAC overhead + four C_out=64 phase convs lose more than the
        # deeper K dims win. Kept as tested infrastructure, off by default.
        "s2d_block1": False,
        # int8 inference: run the whole dense pass (backbone + heads) as
        # int8 MXU convs (394 TOPS on v5e, 2x bf16) with per-channel
        # weights and dynamic per-tensor activations (ops/int8_conv.py).
        # Post-training quantization — vanilla variant, inference only.
        "quantize": None,  # None | "int8"
    }
    required_data_keys = ["image"]

    def setup(self):
        c = self.conf
        use_bn = c.variant == "open"
        bn_kw = dict(use_bn=use_bn, bn_after_relu=use_bn, bn_eps=1e-3 if use_bn else 1e-5)
        chans = list(c.channels)
        backbone = []
        for i, ch in enumerate(chans):
            backbone.append(VGGBlock(ch, name=f"conv{i+1}a", **bn_kw))
            backbone.append(VGGBlock(ch, name=f"conv{i+1}b", **bn_kw))
        self.backbone = backbone
        self.convPa = VGGBlock(c.head_channels, name="convPa", **bn_kw)
        # the open variant batch-normalizes the 1x1 head outputs too
        # (reference superpoint_open.py:108-116: VGGBlock(..., relu=False)
        # still carries a BN after the identity activation)
        self.convPb = VGGBlock(65, kernel=1, relu=False, name="convPb", **bn_kw)
        self.convDa = VGGBlock(c.head_channels, name="convDa", **bn_kw)
        self.convDb = VGGBlock(
            c.descriptor_dim, kernel=1, relu=False, name="convDb", **bn_kw
        )

    def _int8_dense(self, image: jnp.ndarray):
        """Dense pass (backbone + both heads) in int8 (ops/int8_conv.py).

        Returns (logits (B,Hc,Wc,65), raw dense descriptors (B,Hc,Wc,D)),
        both bf16."""
        from ...ops.int8_conv import int8_conv, int8_max_pool, quantize_activation

        p = self.variables["params"]
        x8, s = quantize_activation(image)
        n_blocks = len(self.conf.channels)
        for i in range(n_blocks):
            for tag in ("a", "b"):
                layer = p[f"conv{i+1}{tag}"]["Conv_0"]
                x8, s = int8_conv(x8, s, layer["kernel"], layer["bias"])
            if i < n_blocks - 1:
                x8 = int8_max_pool(x8)
        pa = p["convPa"]["Conv_0"]
        cPa8, sPa = int8_conv(x8, s, pa["kernel"], pa["bias"])
        pb = p["convPb"]["Conv_0"]
        logits = int8_conv(cPa8, sPa, pb["kernel"], pb["bias"], relu=False,
                           requant=False)
        da = p["convDa"]["Conv_0"]
        cDa8, sDa = int8_conv(x8, s, da["kernel"], da["bias"])
        db = p["convDb"]["Conv_0"]
        desc = int8_conv(cDa8, sDa, db["kernel"], db["bias"], relu=False,
                         requant=False)
        return logits, desc

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        bn_train = train and not c.freeze_batch_normalization
        image = rgb_to_grayscale(data["image"])
        x = image
        n_blocks = len(c.channels)
        use_int8 = (
            c.quantize == "int8"
            and c.variant == "vanilla"
            and not train
            and not self.is_initializing()
        )
        if use_int8:
            logits, dense_desc = self._int8_dense(image)
            return self._decode(data, image, logits, dense_desc, train)
        fused_bb = (
            c.fused_backbone
            and c.variant == "vanilla"
            and (jax.default_backend() == "tpu" or pallas_conv.FORCE_INTERPRET)
            and not self.is_initializing()
        )
        use_s2d_block1 = (
            c.s2d_block1
            and c.variant == "vanilla"
            and not self.is_initializing()
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        for i in range(n_blocks):
            has_pool = i < n_blocks - 1
            Hx, Wx = x.shape[1:3]
            ca, cb = int(c.channels[i]), int(c.channels[i])
            if i == 0 and has_pool and use_s2d_block1:
                from ...ops.s2d_conv import vgg_block1_s2d

                p = self.variables["params"]
                x = vgg_block1_s2d(
                    x,
                    p["conv1a"]["Conv_0"]["kernel"].astype(x.dtype),
                    p["conv1a"]["Conv_0"]["bias"].astype(x.dtype),
                    p["conv1b"]["Conv_0"]["kernel"].astype(x.dtype),
                    p["conv1b"]["Conv_0"]["bias"].astype(x.dtype),
                )
                continue
            if (
                fused_bb
                and i > 0  # conv1a has C_in=1 (MXU-hostile in the kernel)
                and fused_vgg_available(Hx, Wx, x.shape[-1], cb)
            ):
                p = self.variables["params"]
                wa = p[f"conv{i+1}a"]["Conv_0"]["kernel"]
                ba_ = p[f"conv{i+1}a"]["Conv_0"]["bias"]
                wb = p[f"conv{i+1}b"]["Conv_0"]["kernel"]
                bb_ = p[f"conv{i+1}b"]["Conv_0"]["bias"]
                x = vgg_block(x, wa, ba_, wb, bb_, pool=has_pool)
            elif (
                fused_bb
                and i == 0
                and fused_vgg_available(Hx, Wx, ca, cb)
            ):
                # conv1a via XLA (flax module), conv1b + pool fused
                x = self.backbone[0](x, train=bn_train)
                p = self.variables["params"]
                wb = p["conv1b"]["Conv_0"]["kernel"]
                bb_ = p["conv1b"]["Conv_0"]["bias"]
                x = vgg_block(x, wb, bb_, pool=has_pool)
            else:
                x = self.backbone[2 * i](x, train=bn_train)
                x = self.backbone[2 * i + 1](x, train=bn_train)
                if has_pool:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # detector head: 65-ch softmax, drop dustbin, 8x8 pixel shuffle
        cPa = self.convPa(x, train=bn_train)
        logits = self.convPb(cPa)  # (B, Hc, Wc, 65)
        cDa = self.convDa(x, train=bn_train)
        dense_desc = self.convDb(cDa)  # (B, Hc, Wc, D)
        return self._decode(data, image, logits, dense_desc, train)

    def _decode(self, data, image, logits, dense_desc, train: bool):
        """Shared decode: softmax + pixel shuffle, descriptor normalization,
        NMS/top-k keypoint selection, descriptor sampling."""
        c = self.conf
        scores = jax.nn.softmax(logits, axis=-1)[..., :64]
        B, Hc, Wc, _ = scores.shape
        scores = scores.reshape(B, Hc, Wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

        # dense 256-d descriptors, L2-normalized
        dense_desc = dense_desc / (
            jnp.linalg.norm(dense_desc, axis=-1, keepdims=True) + 1e-8
        )

        # keypoint selection: NMS -> border removal -> static top-k + mask
        k = int(c.max_num_keypoints)
        if not train and c.max_num_keypoints_val is not None:
            k = int(c.max_num_keypoints_val)
        randomize = train and c.randomize_keypoints_training
        true_size = data.get("image_size")
        Hs, Ws = scores.shape[1:3]
        use_fused = (
            c.fused_detect
            and not randomize
            and c.nms_radius >= 3  # 4x4-tile top-k exactness needs r+1 >= 4
            and (jax.default_backend() == "tpu"
                 or pallas_detect.FORCE_INTERPRET)
            and fused_detect_available(Hs, Ws)
        )
        if use_fused:
            # one VMEM-resident Pallas pass for NMS + border/area mask +
            # tile reduction (ops/pallas_detect.py)
            kpts, kpt_scores, valid = detect_keypoints(
                scores, k, c.detection_threshold, radius=c.nms_radius,
                border=c.remove_borders, true_size=true_size,
            )
        else:
            nmsed = simple_nms(scores, c.nms_radius)
            nmsed = remove_borders(nmsed, c.remove_borders)
            # mask detections beyond the true image area (the image buffer
            # may be padded to a bucketed size for compile-count bounding —
            # the true size lives in data["image_size"])
            if true_size is not None:
                xs = jnp.arange(Ws, dtype=jnp.float32)[None, None, :]
                ys = jnp.arange(Hs, dtype=jnp.float32)[None, :, None]
                b_ = float(c.remove_borders)
                w_true = true_size[:, 0][:, None, None]
                h_true = true_size[:, 1][:, None, None]
                in_area = (xs < w_true - b_) & (ys < h_true - b_)
                nmsed = jnp.where(in_area, nmsed, jnp.zeros_like(nmsed))
            if randomize:
                # score-weighted sampling without replacement via the Gumbel
                # top-k trick (role of reference sample_k_keypoints,
                # superpoint.py:90-94: multinomial ∝ score)
                g = jax.random.gumbel(self.make_rng("sample"), nmsed.shape)
                pert = jnp.where(
                    nmsed > c.detection_threshold,
                    jnp.log(jnp.maximum(nmsed, 1e-20)) + g,
                    -jnp.inf,
                )
                top, idx = jax.lax.top_k(pert.reshape(B, -1), k)
                kpt_scores = jnp.take_along_axis(
                    nmsed.reshape(B, -1), idx, axis=-1
                )
                ys = (idx // Ws).astype(jnp.float32)
                xs = (idx % Ws).astype(jnp.float32)
                kpts = jnp.stack([xs, ys], axis=-1) + 0.5
                valid = jnp.isfinite(top)
            else:
                kpts, kpt_scores, valid = top_k_keypoints(
                    nmsed, k, c.detection_threshold, nms_radius=c.nms_radius
                )

        if c.refinement_radius > 0:
            from ...ops.nms import soft_argmax_refinement

            kpts = soft_argmax_refinement(kpts, scores, int(c.refinement_radius))

        if c.force_num_keypoints:
            rng = self.make_rng("sample")
            size = data.get("image_size")
            if size is None:
                h, w = image.shape[1:3]
                size = jnp.tile(jnp.asarray([[w, h]], jnp.float32), (B, 1))
            u = jax.random.uniform(rng, (B, k, 2), dtype=kpts.dtype)
            rand_kpts = u * size[:, None, :]
            kpts = jnp.where(valid[..., None], kpts, rand_kpts)
            kpt_scores = jnp.where(valid, kpt_scores, 0.0)
            valid = jnp.ones_like(valid)

        # vanilla reproduces sample_descriptors_fix_sampling's legacy offset;
        # open samples at the geometric center (superpoint_open.py:20-31:
        # (k + 0.5)/(wh*s), align_corners=False)
        desc = sample_descriptors(
            kpts, dense_desc, stride=8, legacy_offset=c.variant == "vanilla"
        )
        pred = {
            "keypoints": kpts,
            "keypoint_scores": kpt_scores,
            "keypoint_mask": valid,
            "descriptors": desc,
        }
        if c.dense_outputs:
            pred["dense_descriptors"] = dense_desc
            pred["dense_score_map"] = scores
        return pred

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError("SuperPoint is used frozen; training it is out of scope")
