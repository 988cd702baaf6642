"""ZSSR network (/root/reference/networks/zssr.py:4-60).

Simple fully-convolutional net over an interpolated-to-output-size input,
learning the residual. (BatchNorm off by default — the reference notes
it hurt performance.)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv
from rdst_tpu.nn.layers import activation, resolve_act


class ZSSRNet(nn.Module):
    in_chans: int = 1
    inside_channel: int = 64
    num_layers: int = 8
    residual: bool = True
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        act = activation(self.act)
        y = act(Conv(self.inside_channel, 3, dtype=self.dtype, name="head")(x))
        for i in range(self.num_layers - 2):
            y = act(Conv(self.inside_channel, 3, dtype=self.dtype, name=f"body_{i}")(y))
        y = Conv(self.in_chans, 3, dtype=self.dtype, name="tail")(y)
        return x + y if self.residual else y


def make_zssr(paras, mean=None, std=None, dtype=jnp.float32) -> ZSSRNet:
    return ZSSRNet(
        in_chans=paras.input_channel,
        inside_channel=paras.get("zssr_n_feats", 64),
        num_layers=paras.get("zssr_num_layers", 8),
        residual=paras.get("zssr_residual", True),
        act=resolve_act(paras, paras.get("zssr_act", "relu")),
        dtype=dtype,
    )
