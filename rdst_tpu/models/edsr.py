"""EDSR baseline (/root/reference/networks/edsr.py:6-89).

head conv -> n ResBlocks -> conv -> global residual -> PixelShuffle tail
(or MetaUpSampler when scale_free). feature_maps_only exposes the body
features for MetaSR's pluggable-extractor pattern.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.layers import resolve_act
from rdst_tpu.nn.common import Conv, ResBlock, UpSampler, mean_shift


class EDSR(nn.Module):
    in_chans: int = 1
    sr_scale: int = 4
    n_feats: int = 64
    n_resblocks: int = 16
    res_scale: float = 1.0
    act: str = "leaky_relu"
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    scale_free: bool = False
    feature_maps_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        if not self.feature_maps_only:
            x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        res = x
        for i in range(self.n_resblocks):
            res = ResBlock(self.n_feats, 3, self.act, self.res_scale,
                           dtype=self.dtype, name=f"body_{i}")(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype, name="body_conv")(res)
        res = res + x
        if self.feature_maps_only:
            return res
        if self.scale_free:
            from rdst_tpu.models.meta_upscale import MetaUpSampler

            out = MetaUpSampler(self.in_chans, dtype=self.dtype, name="tail_meta")(res, sr_scale)
        else:
            out = res
            if self.sr_scale > 1:
                out = UpSampler(self.sr_scale, self.n_feats, dtype=self.dtype,
                                name="tail_up")(out)
            out = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(out)
        return mean_shift(out, self.mean, self.std, "add")


def make_edsr(paras, mean=None, std=None, dtype=jnp.float32) -> EDSR:
    c = paras.input_channel
    return EDSR(
        in_chans=c,
        sr_scale=int(paras.sr_scale),
        n_feats=paras.get("edsr_n_feats", 64),
        n_resblocks=paras.get("edsr_n_resblocks", 16),
        res_scale=paras.get("edsr_res_scale", 1.0),
        act=resolve_act(paras, paras.get("edsr_act", "leaky_relu")),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        scale_free=paras.scale_free,
        dtype=dtype,
    )
