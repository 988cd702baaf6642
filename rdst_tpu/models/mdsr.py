"""MDSR multi-scale baseline (/root/reference/networks/mdsr.py:5-118).

Per-scale conv heads/tails for x2/x3/x4 over one shared EDSR-style body.
``sr_scale`` selects the branch per call — a static (trace-time) choice,
so each scale compiles its own lean program.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.layers import resolve_act
from rdst_tpu.nn.common import Conv, ResBlock, UpSampler, mean_shift


class MDSR(nn.Module):
    in_chans: int = 1
    n_feats: int = 64
    n_resblocks: int = 16
    res_scale: float = 1.0
    act: str = "leaky_relu"
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    feature_maps_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=2.0, deterministic: bool = True):
        if float(sr_scale) not in (2.0, 3.0, 4.0):
            # validate BEFORE truncation: int(2.5) == 2 would silently
            # select the wrong branch (the reference raises, mdsr.py:93-106)
            raise ValueError(f"Invalid sr_scale {sr_scale}, should be 2/3/4")
        scale = int(float(sr_scale))
        if not self.feature_maps_only:
            x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.n_feats, 3, dtype=self.dtype, name=f"head_{scale}")(x)
        res = x
        for i in range(self.n_resblocks):
            res = ResBlock(self.n_feats, 3, self.act, self.res_scale,
                           dtype=self.dtype, name=f"body_{i}")(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype, name="body_conv")(res)
        res = res + x
        if self.feature_maps_only:
            return res
        out = UpSampler(scale, self.n_feats, dtype=self.dtype, name=f"tail_up_{scale}")(res)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name=f"tail_conv_{scale}")(out)
        return mean_shift(out, self.mean, self.std, "add")


def make_mdsr(paras, mean=None, std=None, dtype=jnp.float32) -> MDSR:
    c = paras.input_channel
    return MDSR(
        in_chans=c,
        n_feats=paras.get("mdsr_n_feats", 64),
        n_resblocks=paras.get("mdsr_n_resblocks", 16),
        res_scale=paras.get("mdsr_res_scale", 1.0),
        act=resolve_act(paras, paras.get("mdsr_act", "leaky_relu")),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
