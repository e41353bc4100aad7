"""ResNet-FPN backbone for LoFTR (8x coarse / 2x fine), flax/NHWC.

Faithful re-design of the official LoFTR backbone (`ResNetFPN_8_2`,
wrapped by the reference through kornia — `models/matchers/kornia_loftr.py`):
7x7/2 stem (initial_dim=128) -> 3 stages of two BasicBlocks with
block_dims=(128, 196, 256) at strides (1, 2, 2), then a top-down FPN:
coarse output = 1x1-projected stage-3 map (256 @ 1/8), fine output =
progressively merged and 3x3-refined maps down to 128 @ 1/2.
All convs bias-free + BatchNorm, matching the torch layout for weight
conversion (`compat.torch_conversion.convert_loftr`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    leaky: bool = False  # official FPN merge blocks use LeakyReLU

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            use_bias=False, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9,
            name="bn")(x)
        if self.relu:
            x = nn.leaky_relu(x, 0.01) if self.leaky else nn.relu(x)
        return x


class BasicBlock(nn.Module):
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.out, 3, self.stride, name="conv1")(x, train)
        y = ConvBN(self.out, 3, 1, relu=False, name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.out:
            x = ConvBN(self.out, 1, self.stride, relu=False,
                       name="downsample")(x, train)
        return nn.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    initial_dim: int = 128
    block_dims: tuple = (128, 196, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d1, d2, d3 = self.block_dims
        # stem @ 1/2
        x0 = ConvBN(self.initial_dim, 7, 2, name="stem")(x, train)
        # stages
        x1 = BasicBlock(d1, 1, name="layer1_0")(x0, train)
        x1 = BasicBlock(d1, 1, name="layer1_1")(x1, train)  # 1/2
        x2 = BasicBlock(d2, 2, name="layer2_0")(x1, train)
        x2 = BasicBlock(d2, 1, name="layer2_1")(x2, train)  # 1/4
        x3 = BasicBlock(d3, 2, name="layer3_0")(x2, train)
        x3 = BasicBlock(d3, 1, name="layer3_1")(x3, train)  # 1/8

        # FPN top-down
        x3_out = nn.Conv(d3, (1, 1), use_bias=False, name="layer3_outconv")(x3)

        import jax

        def upsample(v, like):
            return jax.image.resize(
                v, (v.shape[0], like.shape[1], like.shape[2], v.shape[3]),
                "bilinear")

        x3_up = upsample(x3_out, x2)
        x2_out = nn.Conv(d3, (1, 1), use_bias=False, name="layer2_outconv")(x2)
        y = x2_out + x3_up
        y = ConvBN(d3, 3, 1, leaky=True, name="layer2_outconv2_0")(y, train)
        y = nn.Conv(d2, (3, 3), padding="SAME", use_bias=False,
                    name="layer2_outconv2_1")(y)
        x2_up = upsample(y, x1)
        x1_out = nn.Conv(d2, (1, 1), use_bias=False, name="layer1_outconv")(x1)
        z = x1_out + x2_up
        z = ConvBN(d2, 3, 1, leaky=True, name="layer1_outconv2_0")(z, train)
        z = nn.Conv(d1, (3, 3), padding="SAME", use_bias=False,
                    name="layer1_outconv2_1")(z)
        return x3_out, z  # coarse (B, H/8, W/8, 256), fine (B, H/2, W/2, 128)
