"""SRDenseNet baseline (/root/reference/networks/srdensenet.py).

Dense blocks with skip-collection modes: 'h' (last block only),
'hl' (head + last), 'all' (head + every block), 1x1 bottleneck,
PixelShuffle tail.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.layers import resolve_act
from rdst_tpu.nn.common import Conv, DenseLayer, UpSampler, mean_shift


class DenseBlock(nn.Module):
    growth_rate: int
    n_dense_layers: int = 8
    act: str = "relu"
    dense_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_dense_layers):
            x = DenseLayer(self.growth_rate, 3, self.act, self.dense_scale,
                           dtype=self.dtype, name=f"dense_{i}")(x)
        return x


class SRDenseNet(nn.Module):
    in_chans: int = 1
    sr_scale: int = 4
    growth_rate: int = 16
    n_dense_layers: int = 8
    n_dense_blocks: int = 8
    skip_type: str = "all"  # 'h' | 'hl' | 'all'
    dense_scale: float = 1.0
    n_feats: int = 256
    act: str = "relu"
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    feature_maps_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        assert self.skip_type in ("h", "hl", "all")
        if not self.feature_maps_only:
            x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.growth_rate, 3, dtype=self.dtype, name="head")(x)

        collected = []
        if self.skip_type in ("hl", "all"):
            collected.append(x)
        for i in range(self.n_dense_blocks):
            x = DenseBlock(self.growth_rate, self.n_dense_layers, self.act,
                           self.dense_scale, dtype=self.dtype, name=f"body_{i}")(x)
            if self.skip_type == "all":
                collected.append(x)
        if self.skip_type in ("h", "hl"):
            collected.append(x)

        x = Conv(self.n_feats, 1, dtype=self.dtype, name="bottleneck")(
            jnp.concatenate(collected, axis=-1))
        if self.feature_maps_only:
            return x
        if self.sr_scale > 1:
            x = UpSampler(self.sr_scale, self.n_feats, dtype=self.dtype, name="tail_up")(x)
        x = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(x)
        return mean_shift(x, self.mean, self.std, "add")


def make_srdensenet(paras, mean=None, std=None, dtype=jnp.float32) -> SRDenseNet:
    c = paras.input_channel
    return SRDenseNet(
        in_chans=c, sr_scale=int(paras.sr_scale),
        growth_rate=paras.get("srdensenet_growth_rate", 16),
        n_dense_layers=paras.get("srdensenet_n_dense_layers", 8),
        n_dense_blocks=paras.get("srdensenet_n_dense_blocks", 8),
        skip_type=paras.get("srdensenet_type", "all"),
        dense_scale=paras.get("srdensenet_dense_scale", 1.0),
        n_feats=paras.get("srdensenet_n_feats", 256),
        act=resolve_act(paras, paras.get("srdensenet_act", "relu")),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
