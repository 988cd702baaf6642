"""Segmentation UNet (smp.Unet-compatible topology) in flax.

The reference's seg perceptual loss wraps a frozen
``segmentation_models_pytorch.Unet`` (ResNet34 encoder, decoder channels
256/128/64/32/16, conv3x3 head) loaded from ``loss/unet_*.pt``
(/root/reference/loss/seg_unet.py:23-58). This is the same topology in
flax (NHWC), so those checkpoints can be imported, and a fresh UNet can
be trained natively on synthetic labels when the blobs are unavailable.

Forward returns (features, decoder_out, logits) where ``features`` is the
smp encoder list [x, f1 /2, f2 /4, f3 /8, f4 /16, f5 /32].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.layers import torch_conv_init


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, kernel_init=torch_conv_init, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=False, kernel_init=torch_conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet34Encoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = [x]
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        feats.append(y)  # f1: /2, 64
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, ch) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                y = _BasicBlock(ch, stride, dtype=self.dtype,
                                name=f"layer{stage + 1}_{b}")(y, train)
            feats.append(y)  # f2 /4, f3 /8, f4 /16, f5 /32
        return feats


class _DecoderBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest x2
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for i in (1, 2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        kernel_init=torch_conv_init, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class SegUNet(nn.Module):
    """smp.Unet(resnet34) equivalent: encoder + UNet decoder + seg head."""

    in_channels: int = 1
    classes: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[list, jax.Array, jax.Array]:
        # encoder downsamples /32: reflect-pad arbitrary inputs (the
        # reference reflection-pads to its fixed training size,
        # seg_unet.py:66-68) and crop spatial outputs back
        h, w = x.shape[1:3]
        ph = (-h) % 32
        pw = (-w) % 32
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        feats = ResNet34Encoder(dtype=self.dtype, name="encoder")(x, train)
        skips = [feats[4], feats[3], feats[2], feats[1], None]
        y = feats[5]
        for i, ch in enumerate(self.decoder_channels):
            y = _DecoderBlock(ch, dtype=self.dtype, name=f"decoder_{i}")(y, skips[i], train)
        logits = nn.Conv(self.classes, (3, 3), padding=1,
                         kernel_init=torch_conv_init, dtype=self.dtype,
                         name="segmentation_head")(y)
        if ph or pw:
            y = y[:, :h, :w, :]
            logits = logits[:, :h, :w, :]
        return feats, y, logits


def init_seg_unet(in_channels: int, classes: int, seed: int = 0,
                  spatial: Tuple[int, int] = (96, 96)):
    """Initialize a SegUNet; returns (module, variables with batch_stats)."""
    model = SegUNet(in_channels=in_channels, classes=classes)
    x = jnp.zeros((1, spatial[0], spatial[1], in_channels))
    variables = model.init(jax.random.PRNGKey(seed), x)
    return model, variables
