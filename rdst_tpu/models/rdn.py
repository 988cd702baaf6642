"""RDN baseline (/root/reference/networks/rdn.py:19-124).

head -> F0 conv -> N residual dense blocks -> concat all block outputs ->
1x1 + 3x3 bottleneck -> scaled global residual -> PixelShuffle tail.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv, ResidualDenseBlock, UpSampler, mean_shift


class RDN(nn.Module):
    in_chans: int = 1
    sr_scale: int = 4
    n_feats: int = 64
    growth_rate: int = 32
    n_dense_layers: int = 6
    n_blocks: int = 20
    dense_scale: float = 1.0
    local_res_scale: float = 1.0
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
        fn1 = Conv(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        x = Conv(self.n_feats, 3, dtype=self.dtype, name="F0")(fn1)

        feature_maps = []
        for i in range(self.n_blocks):
            x = ResidualDenseBlock(
                self.growth_rate, self.n_dense_layers, 3, self.act,
                self.dense_scale, self.local_res_scale,
                dtype=self.dtype, name=f"body_{i}")(x)
            feature_maps.append(x)
        x = jnp.concatenate(feature_maps, axis=-1)
        x = Conv(self.n_feats, 1, dtype=self.dtype, name="bottleneck_0")(x)
        x = Conv(self.n_feats, 3, dtype=self.dtype, name="bottleneck_1")(x)
        x = x * self.global_res_scale + fn1
        if self.feature_maps_only:
            return x
        if self.sr_scale > 1:
            x = UpSampler(self.sr_scale, self.n_feats, dtype=self.dtype, name="tail_up")(x)
        x = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(x)
        return mean_shift(x, self.mean, self.std, "add")


def make_rdn(paras, mean=None, std=None, dtype=jnp.float32) -> RDN:
    c = paras.input_channel
    return RDN(
        in_chans=c,
        sr_scale=int(paras.sr_scale),
        n_feats=paras.get("rdn_n_feats", 64),
        growth_rate=paras.get("rdn_growth_rate", 32),
        n_dense_layers=paras.get("rdn_n_dense_layers", 6),
        n_blocks=paras.get("rdn_n_blocks", 20),
        dense_scale=paras.get("rdn_dense_scale", 1.0),
        local_res_scale=paras.get("rdn_local_res_scale", 1.0),
        global_res_scale=paras.get("rdn_global_res_scale", 1.0),
        act=paras.get("act", "leaky_relu"),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
