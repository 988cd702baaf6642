"""ConvNeXt-SR baseline (/root/reference/networks/convnet.py).

ConvNeXt blocks (depthwise 7x7 -> LN -> pointwise MLP -> layer scale)
over a conv head, scaled global residual, PixelShuffle tail.
lite = 64 feats x 16 blocks, large = 192 x 32. NOTE: the reference's
forward never applies the mean-shift layers it builds (convnet.py:88-96)
— kept for parity.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv, UpSampler
from rdst_tpu.nn.layers import gelu_exact, torch_conv_init, trunc_normal_init


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, kernel_init=trunc_normal_init,
                     dtype=self.dtype, name="pwconv1")(y)
        y = gelu_exact(y)
        y = nn.Dense(self.dim, kernel_init=trunc_normal_init,
                     dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.layer_scale_init),
            (self.dim,),
        )
        return x + gamma * y


class ConvNetSR(nn.Module):
    in_chans: int = 1
    sr_scale: int = 4
    n_feats: int = 64
    n_blocks: int = 16
    res_scale: float = 1.0
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        x = Conv(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        fn = x
        for i in range(self.n_blocks):
            x = ConvNeXtBlock(self.n_feats, dtype=self.dtype, name=f"body_{i}")(x)
        x = x + fn * self.res_scale
        x = UpSampler(self.sr_scale, self.n_feats, dtype=self.dtype, name="tail_up")(x)
        return Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(x)


def make_convnet_large(paras, mean=None, std=None, dtype=jnp.float32) -> ConvNetSR:
    return ConvNetSR(in_chans=paras.input_channel, sr_scale=int(paras.sr_scale),
                     n_feats=192, n_blocks=32, dtype=dtype)


def make_convnet_lite(paras, mean=None, std=None, dtype=jnp.float32) -> ConvNetSR:
    return ConvNetSR(in_chans=paras.input_channel, sr_scale=int(paras.sr_scale),
                     n_feats=64, n_blocks=16, dtype=dtype)
