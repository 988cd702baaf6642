"""DBPN — Deep Back-Projection Network (/root/reference/networks/dbpn.py).

Alternating up/down projection units with optional dense inter-unit
concatenation (D-DBPN); reconstruction conv over all H_t outputs.
Deconvs are ConvTranspose(k, s) with VALID padding + symmetric crop
(equivalent to torch ConvTranspose2d(k, s, p)). Scale-dependent kernel
params per the paper: x2 (6,2,2), x4 (8,4,2), x8 (12,8,2).
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv
from rdst_tpu.nn.layers import activation, torch_conv_init

_CONV_PARAS = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}
_prelu = activation("prelu")


class _Deconv(nn.Module):
    features: int
    kernel: int
    stride: int
    pad: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(self.features, (self.kernel, self.kernel),
                             (self.stride, self.stride), padding="VALID",
                             kernel_init=torch_conv_init, dtype=self.dtype,
                             name="deconv")(x)
        p = self.pad
        return y[:, p : y.shape[1] - p, p : y.shape[2] - p, :]


class _StridedConv(nn.Module):
    features: int
    kernel: int
    stride: int
    pad: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       (self.stride, self.stride), padding=self.pad,
                       kernel_init=torch_conv_init, dtype=self.dtype,
                       name="conv")(x)


class UpProjectionUnit(nn.Module):
    out_c: int
    sr_factor: int
    dense_input: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lt_1):
        k, s, p = _CONV_PARAS[self.sr_factor]
        if self.dense_input:
            lt_1 = _prelu(Conv(self.out_c, 1, dtype=self.dtype, name="input")(lt_1))
        ht0 = _prelu(_Deconv(self.out_c, k, s, p, dtype=self.dtype, name="deconv_0")(lt_1))
        lt0 = _prelu(_StridedConv(self.out_c, k, s, p, dtype=self.dtype, name="conv")(ht0))
        ht1 = _prelu(_Deconv(self.out_c, k, s, p, dtype=self.dtype, name="deconv_1")(lt0 - lt_1))
        return ht0 + ht1


class DownProjectionUnit(nn.Module):
    out_c: int
    sr_factor: int
    dense_input: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ht):
        k, s, p = _CONV_PARAS[self.sr_factor]
        if self.dense_input:
            ht = _prelu(Conv(self.out_c, 1, dtype=self.dtype, name="input")(ht))
        lt0 = _prelu(_StridedConv(self.out_c, k, s, p, dtype=self.dtype, name="conv_0")(ht))
        ht0 = _prelu(_Deconv(self.out_c, k, s, p, dtype=self.dtype, name="deconv")(lt0))
        lt1 = _prelu(_StridedConv(self.out_c, k, s, p, dtype=self.dtype, name="conv_1")(ht0 - ht))
        return lt0 + lt1


class DBPN(nn.Module):
    in_chans: int = 1
    n0: int = 256
    nr: int = 64
    t: int = 7
    sr_scale: int = 4
    dense: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        f = _prelu(Conv(self.n0, 3, dtype=self.dtype, name="input_conv_0")(x))
        f = _prelu(Conv(self.nr, 1, dtype=self.dtype, name="input_conv_1")(f))

        hs, ls = [], []
        for i in range(self.t):
            if i and self.dense:
                f = jnp.concatenate(ls, axis=-1)
            # at i=1 the dense concat is a single nr-channel tensor, so the
            # reference creates no 1x1 merge conv (dbpn.py:189-195: ic==oc)
            f = UpProjectionUnit(self.nr, self.sr_scale,
                                 dense_input=self.dense and i > 1,
                                 dtype=self.dtype, name=f"up_{i}")(f)
            hs.append(f)
            if i != self.t - 1:
                if self.dense:
                    f = jnp.concatenate(hs, axis=-1)
                f = DownProjectionUnit(self.nr, self.sr_scale,
                                       dense_input=self.dense and len(hs) > 1,
                                       dtype=self.dtype, name=f"down_{i}")(f)
                ls.append(f)
        return Conv(self.in_chans, 3, dtype=self.dtype, name="reconstruction")(
            jnp.concatenate(hs, axis=-1))


def make_dbpn(paras, mean=None, std=None, dtype=jnp.float32) -> DBPN:
    return DBPN(
        in_chans=paras.input_channel,
        n0=paras.get("dbpn_n0", 256),
        nr=paras.get("dbpn_nr", 64),
        t=paras.get("dbpn_t", 7),
        sr_scale=int(paras.sr_scale),
        dense=paras.get("dbpn_dense", True),
        dtype=dtype,
    )
