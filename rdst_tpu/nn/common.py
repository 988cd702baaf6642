"""Conv-side building blocks shared across SR models.

Parity targets (/root/reference/networks/common.py):
* conv3x3 etc. — default_conv (same-padding conv with bias)
* MeanShift   — frozen 1x1 conv encoding (mean, std); here a closed-form
  elementwise op (common.py:151-167) since the weights are never trained
* pixel_shuffle — torch nn.PixelShuffle channel ordering, on NHWC
* UpSampler   — conv(C->4C)+shuffle(2) per octave, or conv(C->9C)+shuffle(3)
* ResBlock / dense blocks for the CNN model family
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.layers import activation, torch_conv_init


class Conv(nn.Module):
    """Same-padding conv (NHWC) with torch-style default init."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.kernel_size // 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_conv_init,
            name="conv",
        )(x)


def mean_shift(x: jax.Array, mean: Sequence[float], std: Sequence[float], mode: str) -> jax.Array:
    """Elementwise (x - mean)/std ('sub') or x*std + mean ('add')."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    if mode == "sub":
        return (x - mean) / std
    if mode == "add":
        return x * std + mean
    raise ValueError("mode must be 'sub' or 'add'")


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle with torch channel ordering.

    Input channels are laid out as (C_out, r, r) fastest-last, i.e.
    out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j] — matching
    torch.nn.PixelShuffle so imported conv weights upsample identically.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


class UpSampler(nn.Module):
    """PixelShuffle upscaling chain (common.py:125-148).

    scale must be 2^n or 3. Sub-conv names 'conv_0', 'conv_1', ... map to
    the reference nn.Sequential indices for weight import.
    """

    scale: int
    n_feats: int
    act: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = activation(self.act) if self.act else None
        if (self.scale & (self.scale - 1)) == 0:
            for i in range(int(math.log2(self.scale))):
                x = Conv(4 * self.n_feats, 3, dtype=self.dtype, name=f"conv_{i}")(x)
                x = pixel_shuffle(x, 2)
                if act:
                    x = act(x)
        elif self.scale == 3:
            x = Conv(9 * self.n_feats, 3, dtype=self.dtype, name="conv_0")(x)
            x = pixel_shuffle(x, 3)
            if act:
                x = act(x)
        else:
            raise NotImplementedError(f"SR scale {self.scale} is not valid.")
        return x


class ResBlock(nn.Module):
    """conv-act-conv with scaled residual (common.py:26-45)."""

    n_feats: int
    kernel_size: int = 3
    act: str = "relu"
    res_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feats, self.kernel_size, dtype=self.dtype, name="conv_0")(x)
        y = activation(self.act)(y)
        y = Conv(self.n_feats, self.kernel_size, dtype=self.dtype, name="conv_1")(y)
        return x + y * self.res_scale


class DenseLayer(nn.Module):
    """conv+act then channel-concat (common.py:48-66)."""

    growth_rate: int
    kernel_size: int = 3
    act: str = "relu"
    dense_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.growth_rate, self.kernel_size, dtype=self.dtype, name="conv")(x)
        y = activation(self.act)(y)
        return jnp.concatenate([x, y * self.dense_scale], axis=-1)


class ResidualDenseBlock(nn.Module):
    """n dense layers + 1x1 bottleneck + scaled residual (common.py:86-101)."""

    growth_rate: int
    n_dense_layers: int = 8
    kernel_size: int = 3
    act: str = "relu"
    dense_scale: float = 1.0
    res_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.n_dense_layers):
            y = DenseLayer(self.growth_rate, self.kernel_size, self.act,
                           self.dense_scale, dtype=self.dtype, name=f"dense_{i}")(y)
        y = Conv(x.shape[-1], 1, dtype=self.dtype, name="bottleneck")(y)
        return x + y * self.res_scale
