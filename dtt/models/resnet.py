"""ResNet-101 backbone with dilated conv5 and frozen BatchNorm.

TPU-native equivalent of the reference backbone
(ref: lib/model/rfcn/resnet_atrous.py — torchvision-layout ResNet-101 with
the conv5 stride removed and dilation=2, BN frozen to affine transforms, and
conv1+layer1 frozen, per R-FCN practice / D&T paper §3.1).

Design notes:
* BN is *always* frozen in this model family (batch=1-2 per device makes BN
  statistics useless), so it is represented directly as a per-channel affine
  `y = x * scale + bias` whose parameters take no gradient. The PyTorch
  importer folds (gamma, beta, running_mean, running_var) into (scale, bias).
* Freezing of the stem + layer1 is done with stop_gradient on their outputs:
  XLA then prunes the entire backward computation for those stages.
* Compute dtype is configurable (bfloat16 by default — MXU native); params
  stay float32.
* Stride placement follows torchvision (stride on the 3x3 conv of each
  bottleneck) so torchvision/caffe-converted checkpoints map 1:1.

Returns the c3 (stride 8), c4 (stride 16), c5 (stride 16, dilated) pyramid
used by the RPN (c4), the R-FCN heads (c5), and the multi-scale correlation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class FrozenAffine(nn.Module):
    """Frozen BatchNorm: per-channel scale & bias, no gradient."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        scale = jax.lax.stop_gradient(scale).astype(self.dtype)
        bias = jax.lax.stop_gradient(bias).astype(self.dtype)
        return x.astype(self.dtype) * scale + bias


class StemConv(nn.Module):
    """The 7x7/2 stem conv, by default computed via space-to-depth.

    Space-to-depth(2) + a 4x4 stride-1 conv over 12 channels is
    MATHEMATICALLY IDENTICAL to the 7x7/2 (the 4x4 kernel is a
    rearrangement of the same 7x7 weights, so the param tree, checkpoints,
    and the torch importer are untouched). MEASURED NEGATIVE on v5e at the
    production shape (17 frames 608x1088 bf16: direct 4.69 ms vs s2d
    5.33 ms — both are HBM-bound at K<=48, and the s2d input transpose
    costs more than the better MXU packing buys), so s2d defaults OFF; the
    exact-equivalence tests keep the option honest if a future platform
    flips the tradeoff.
    """

    features: int = 64
    dtype: jnp.dtype = jnp.bfloat16
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        if self.s2d and h % 2 == 0 and w % 2 == 0:
            # x2[p, q, (a*2+b)*C + c] = x[2p+a, 2q+b, c]
            x2 = (x.reshape(b, h // 2, 2, w // 2, 2, cin)
                  .transpose(0, 1, 3, 2, 4, 5)
                  .reshape(b, h // 2, w // 2, 4 * cin))
            # y[i,j] = sum_{u,v} K7[u,v] x[2i+u-3, 2j+v-3]; substituting
            # u = 2m+a-1 (m in [0,4), a in {0,1}) maps K7 (zero-padded to
            # 8x8 at the leading edge) onto a 4x4 kernel over the s2d layout
            k7p = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k4 = (k7p.reshape(4, 2, 4, 2, cin, self.features)
                  .transpose(0, 2, 1, 3, 4, 5)
                  .reshape(4, 4, 4 * cin, self.features))
            return jax.lax.conv_general_dilated(
                x2, k4, (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    planes: int            # bottleneck width; output is 4*planes
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, d, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(d * (k // 2),) * 2] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        out = conv(self.planes, 1, 1, 1, "conv1")(x)
        out = FrozenAffine(self.planes, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, self.dilation, "conv2")(out)
        out = FrozenAffine(self.planes, self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, 1, 1, "conv3")(out)
        out = FrozenAffine(self.planes * 4, self.dtype, name="bn3")(out)
        if self.downsample:
            sc = conv(self.planes * 4, 1, self.stride, 1, "downsample_conv")(x)
            sc = FrozenAffine(self.planes * 4, self.dtype, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class _ScanBottleneck(nn.Module):
    """nn.scan body: one identity-shaped bottleneck per scan step."""

    planes: int
    dilation: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, _):
        y = Bottleneck(self.planes, 1, self.dilation,
                       dtype=self.dtype, name="block")(x)
        return y, None


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # rematerialize blocks in backward (memory for FLOPs)
    scan: bool = False   # lax.scan over the identical blocks (small jit graph)

    @nn.compact
    def __call__(self, x):
        block = nn.remat(Bottleneck) if self.remat else Bottleneck
        x = block(self.planes, self.stride, self.dilation,
                  downsample=True, dtype=self.dtype, name="block0")(x)
        if self.scan and self.blocks > 1:
            # Identity-shaped blocks 1..N-1 run as ONE scanned body with
            # stacked params: the HLO holds one block regardless of depth
            # (layer3 of ResNet-101 = 22 blocks), shrinking compile time and
            # program upload size (the tunnel 413-limits huge graphs —
            # CLAUDE.md). Remat composes per scan step: peak activation
            # memory is one block deep.
            body = nn.remat(_ScanBottleneck, prevent_cse=False) \
                if self.remat else _ScanBottleneck
            scanned = nn.scan(body, variable_axes={"params": 0},
                              split_rngs={"params": True},
                              length=self.blocks - 1)
            x, _ = scanned(self.planes, self.dilation, self.dtype,
                           name="blocks")(x, None)
        else:
            for i in range(1, self.blocks):
                x = block(self.planes, 1, self.dilation,
                          dtype=self.dtype, name=f"block{i}")(x)
        return x


class ResNetBackbone(nn.Module):
    """Dilated ResNet returning (c3, c4, c5). NHWC."""

    layers: Sequence[int] = (3, 4, 23, 3)  # resnet101
    frozen_stages: int = 2                 # freeze stem(1) + layer1(2)
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    scan: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = StemConv(64, self.dtype, name="conv1")(x)
        x = FrozenAffine(64, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)

        x = ResNetStage(64, self.layers[0], stride=1, dtype=self.dtype,
                        remat=self.remat, scan=self.scan, name="layer1")(x)
        if self.frozen_stages >= 2:
            x = jax.lax.stop_gradient(x)

        c3 = ResNetStage(128, self.layers[1], stride=2, dtype=self.dtype,
                         remat=self.remat, scan=self.scan, name="layer2")(x)
        if self.frozen_stages >= 3:
            c3 = jax.lax.stop_gradient(c3)
        c4 = ResNetStage(256, self.layers[2], stride=2, dtype=self.dtype,
                         remat=self.remat, scan=self.scan, name="layer3")(c3)
        # conv5: stride removed, dilation 2 (atrous) => stays at stride 16
        c5 = ResNetStage(512, self.layers[3], stride=1, dilation=2,
                         dtype=self.dtype, remat=self.remat, scan=self.scan,
                         name="layer4")(c4)
        return c3, c4, c5


def resnet101(frozen_stages: int = 2, dtype=jnp.bfloat16) -> ResNetBackbone:
    return ResNetBackbone((3, 4, 23, 3), frozen_stages, dtype)


def resnet50(frozen_stages: int = 2, dtype=jnp.bfloat16) -> ResNetBackbone:
    return ResNetBackbone((3, 4, 6, 3), frozen_stages, dtype)


def tiny_resnet(dtype=jnp.float32) -> ResNetBackbone:
    """Miniature backbone for tests / synthetic integration runs."""
    return ResNetBackbone((1, 1, 1, 1), frozen_stages=0, dtype=dtype)
