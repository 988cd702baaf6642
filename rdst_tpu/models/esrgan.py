"""ESRGAN generator (RRDB) baseline (/root/reference/networks/esrgan.py).

Residual-in-residual dense blocks (n_rdb RDBs per RRDB, scaled residuals
at both levels), scaled global residual, PixelShuffle tail.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.layers import resolve_act
from rdst_tpu.nn.common import Conv, ResidualDenseBlock, UpSampler, mean_shift


class RRDB(nn.Module):
    growth_rate: int
    n_dense_layers: int = 4
    n_rdb: int = 3
    act: str = "leaky_relu"
    dense_scale: float = 1.0
    rdb_res_scale: float = 0.2
    rrdb_res_scale: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.n_rdb):
            y = ResidualDenseBlock(self.growth_rate, self.n_dense_layers, 3,
                                   self.act, self.dense_scale, self.rdb_res_scale,
                                   dtype=self.dtype, name=f"rdb_{i}")(y)
        return x + y * self.rrdb_res_scale


class ESRGAN(nn.Module):
    in_chans: int = 1
    sr_scale: int = 4
    n_feats: int = 64
    growth_rate: int = 32
    n_dense_layers: int = 4
    n_rdb: int = 3
    n_blocks: int = 8
    dense_scale: float = 1.0
    rdb_res_scale: float = 0.2
    rrdb_res_scale: float = 0.2
    global_res_scale: float = 1.0
    act: str = "leaky_relu"
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    feature_maps_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        if not self.feature_maps_only:
            x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        res = x
        for i in range(self.n_blocks):
            res = RRDB(self.growth_rate, self.n_dense_layers, self.n_rdb,
                       self.act, self.dense_scale, self.rdb_res_scale,
                       self.rrdb_res_scale, dtype=self.dtype, name=f"body_{i}")(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype, name="body_conv")(res)
        res = res * self.global_res_scale + x
        if self.feature_maps_only:
            return res
        out = res
        if self.sr_scale > 1:
            out = UpSampler(self.sr_scale, self.n_feats, dtype=self.dtype, name="tail_up")(out)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(out)
        return mean_shift(out, self.mean, self.std, "add")


def make_esrgan(paras, mean=None, std=None, dtype=jnp.float32) -> ESRGAN:
    c = paras.input_channel
    return ESRGAN(
        in_chans=c, sr_scale=int(paras.sr_scale),
        n_feats=paras.get("esrgan_n_feats", 64),
        growth_rate=paras.get("esrgan_growth_rate", 32),
        n_dense_layers=paras.get("esrgan_n_dense_layers", 4),
        n_rdb=paras.get("esrgan_n_rdb", 3),
        n_blocks=paras.get("esrgan_n_blocks", 8),
        dense_scale=paras.get("esrgan_dense_scale", 1.0),
        rdb_res_scale=paras.get("esrgan_rdb_res_scale", 0.2),
        rrdb_res_scale=paras.get("esrgan_rrdb_res_scale", 0.2),
        global_res_scale=paras.get("esrgan_global_res_scale", 1.0),
        act=resolve_act(paras, paras.get("esrgan_act", "leaky_relu")),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
