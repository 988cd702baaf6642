"""RCAN baseline (/root/reference/networks/rcan.py).

Channel-attention residual groups; the reference hard-codes 10 groups x
20 blocks x 64 feats, reduction 16 (rcan.py:9) and uses its quirky
``Ada_conv`` inside RCAB — a hard 0/1 gate (from a sigmoid of a 1x1 conv
over the spatially-TRANSPOSED read of x) blending two 3x3 convs. The
gate is non-differentiable in torch (constant through autograd); here it
is wrapped in stop_gradient for identical training behavior.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv, UpSampler, mean_shift


class CALayer(nn.Module):
    """Squeeze-excite channel attention (rcan.py:18-34)."""

    channel: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv(self.channel // self.reduction, 1, dtype=self.dtype, name="du_0")(y)
        y = jax.nn.relu(y)
        y = Conv(self.channel, 1, dtype=self.dtype, name="du_1")(y)
        return x * jax.nn.sigmoid(y)


class AdaConv(nn.Module):
    """Hard-gated dual conv (rcan.py:39-63): mask from sigmoid(1x1 conv)
    over the transposed-spatial read of x, thresholded at 0.5
    (mask=1 where sigmoid < 0.5 — the reference's inverted convention)."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # torch: x.permute(0,1,3,2).contiguous().view(B,C,H,W): read the
        # H/W-transposed data back as (H, W)
        xt = x.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        gate = jax.nn.sigmoid(Conv(self.features, 1, dtype=self.dtype, name="conv0")(xt))
        mask = jax.lax.stop_gradient(jnp.where(gate < 0.5, 1.0, 0.0))
        y1 = Conv(self.features, self.kernel_size, dtype=self.dtype, name="conv1")(x)
        y2 = Conv(self.features, self.kernel_size, dtype=self.dtype, name="conv2")(x)
        return y1 * mask + y2 * (1.0 - mask)


class RCAB(nn.Module):
    """Residual channel attention block with AdaConv bodies (rcan.py:94-113)."""

    n_feat: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = AdaConv(self.n_feat, 3, dtype=self.dtype, name="conv_0")(x)
        y = jax.nn.relu(y)
        y = AdaConv(self.n_feat, 3, dtype=self.dtype, name="conv_1")(y)
        y = CALayer(self.n_feat, self.reduction, dtype=self.dtype, name="ca")(y)
        return x + y


class ResidualGroup(nn.Module):
    n_feat: int
    n_resblocks: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.n_resblocks):
            y = RCAB(self.n_feat, self.reduction, dtype=self.dtype, name=f"rcab_{i}")(y)
        y = Conv(self.n_feat, 3, dtype=self.dtype, name="conv")(y)
        return x + y


class RCAN(nn.Module):
    in_chans: int = 1
    sr_scale: int = 4
    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 64
    reduction: int = 16
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        res = x
        for i in range(self.n_resgroups):
            res = ResidualGroup(self.n_feats, self.n_resblocks, self.reduction,
                                dtype=self.dtype, name=f"body_{i}")(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype, name="body_conv")(res)
        res = res + x
        out = UpSampler(self.sr_scale, self.n_feats, dtype=self.dtype, name="tail_up")(res)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(out)
        return mean_shift(out, self.mean, self.std, "add")


def make_rcan(paras, mean=None, std=None, dtype=jnp.float32) -> RCAN:
    c = paras.input_channel
    return RCAN(
        in_chans=c, sr_scale=int(paras.sr_scale),
        n_resgroups=10, n_resblocks=20, n_feats=64, reduction=16,
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
