"""HAN baseline (/root/reference/networks/han.py).

RCAN-style residual groups (standard convs in HAN's RCAB) + holistic
attention: LAM (layer attention over the stacked group outputs) and
CSAM (3D-conv channel-spatial gate), fused by two 3x3 convs before the
global residual. Reference hard-codes 10 groups x 20 blocks x 128 feats.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv, UpSampler, mean_shift
from rdst_tpu.nn.layers import torch_conv_init
from rdst_tpu.models.rcan import CALayer


class HanRCAB(nn.Module):
    n_feat: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feat, 3, dtype=self.dtype, name="conv_0")(x)
        y = jax.nn.relu(y)
        y = Conv(self.n_feat, 3, dtype=self.dtype, name="conv_1")(y)
        y = CALayer(self.n_feat, self.reduction, dtype=self.dtype, name="ca")(y)
        return x + y


class HanResidualGroup(nn.Module):
    n_feat: int
    n_resblocks: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.n_resblocks):
            y = HanRCAB(self.n_feat, self.reduction, dtype=self.dtype, name=f"rcab_{i}")(y)
        y = Conv(self.n_feat, 3, dtype=self.dtype, name="conv")(y)
        return x + y


class LAM(nn.Module):
    """Layer attention over stacked group outputs (han.py:32-63).

    x: (B, N, H, W, C) -> softmax((max-sub) gram over layers) @ values,
    scaled by a learned gamma and residual-added, flattened to N*C.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        gamma = self.param("gamma", jax.nn.initializers.zeros, (1,))
        flat = x.reshape(b, n, -1)
        energy = jnp.einsum("bnd,bmd->bnm", flat, flat)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", attn, flat).reshape(b, n, h, w, c)
        out = gamma * out + x
        # flatten layers into channels: (B, H, W, N*C) with layer-major order
        return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)


class CSAM(nn.Module):
    """Channel-spatial attention via a 3x3x3 conv gate (han.py:66-103)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        gamma = self.param("gamma", jax.nn.initializers.zeros, (1,))
        # torch Conv3d(1,1,3) over (B,1,C,H,W): channels are a depth axis.
        # NDHWC layout: (B, C, H, W, 1)
        vol = x.transpose(0, 3, 1, 2)[..., None]
        gate = nn.Conv(1, (3, 3, 3), padding=1, dtype=self.dtype,
                       kernel_init=torch_conv_init, name="conv3d")(vol)
        gate = jax.nn.sigmoid(gate)[..., 0].transpose(0, 2, 3, 1)  # (B,H,W,C)
        return x * (gamma * gate) + x


class HAN(nn.Module):
    in_chans: int = 1
    sr_scale: int = 4
    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 128
    reduction: int = 16
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.n_feats, 3, dtype=self.dtype, name="head")(x)

        res = x
        # the reference prepends each group's output (newest first, han.py:204-209)
        stacked = []
        for i in range(self.n_resgroups):
            res = HanResidualGroup(self.n_feats, self.n_resblocks, self.reduction,
                                   dtype=self.dtype, name=f"body_{i}")(res)
            stacked.insert(0, res)
        res = Conv(self.n_feats, 3, dtype=self.dtype, name="body_conv")(res)
        stacked.insert(0, res)  # body's final conv output is prepended last

        out1 = res
        la = LAM(dtype=self.dtype, name="la")(jnp.stack(stacked, axis=1))
        out2 = Conv(self.n_feats, 3, dtype=self.dtype, name="last_conv")(la)
        out1 = CSAM(dtype=self.dtype, name="csa")(out1)
        fused = Conv(self.n_feats, 3, dtype=self.dtype, name="last")(
            jnp.concatenate([out1, out2], axis=-1))
        fused = fused + x

        out = UpSampler(self.sr_scale, self.n_feats, dtype=self.dtype, name="tail_up")(fused)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(out)
        return mean_shift(out, self.mean, self.std, "add")


def make_han(paras, mean=None, std=None, dtype=jnp.float32) -> HAN:
    c = paras.input_channel
    return HAN(
        in_chans=c, sr_scale=int(paras.sr_scale),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
