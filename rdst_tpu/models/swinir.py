"""SwinIR baseline (flax), /root/reference/networks/swin_transformer_sr.py:605-868.

Supports the same upsampler variants: 'pixelshuffle' (classical),
'pixelshuffledirect' (lightweight, the shipped configs' choice),
'nearest+conv' (real-world x4), and '' (denoise: global input residual).
Stochastic-depth schedule is linear over all blocks like the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.models.rdst import pad_to_window_multiple, to_image, to_tokens
from rdst_tpu.nn.common import Conv, pixel_shuffle
from rdst_tpu.nn.layers import LayerNorm, activation, trunc_normal_init
from rdst_tpu.nn.swin import BasicLayer


class RSTB(nn.Module):
    """Residual Swin Transformer Block (swin_transformer_sr.py:412-484)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    resi_connection: str = "1conv"
    build_resolution: Optional[Tuple[int, int]] = None
    layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True):
        shortcut = x
        x = BasicLayer(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop=self.drop, attn_drop=self.attn_drop,
            drop_path=tuple(self.drop_path),
            build_resolution=self.build_resolution,
            layer_norm=self.layer_norm, dtype=self.dtype,
            name="residual_group",
        )(x, x_size, deterministic)
        y = to_image(x, x_size)
        if self.resi_connection == "1conv":
            y = Conv(self.dim, 3, dtype=self.dtype, name="conv")(y)
        else:
            lrelu = activation("leaky_relu", 0.2)
            y = Conv(self.dim // 4, 3, dtype=self.dtype, name="conv_0")(y)
            y = lrelu(y)
            y = Conv(self.dim // 4, 1, dtype=self.dtype, name="conv_2")(y)
            y = lrelu(y)
            y = Conv(self.dim, 3, dtype=self.dtype, name="conv_4")(y)
        y, _ = to_tokens(y)
        return y + shortcut


class SwinIR(nn.Module):
    in_chans: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""
    resi_connection: str = "1conv"
    num_feat: int = 64
    # build-time resolution quirk: swinir_make_model recomputes img_size to
    # (lr_patch//scale//ws+1)*ws (swin_transformer_sr.py:855), which decides
    # the constructor-time shift clamp for every block
    build_resolution: Optional[Tuple[int, int]] = None
    layer_norm: bool = True  # sir_layer_norm: False = Identity norms
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        # DIV2K RGB mean for 3-channel inputs, zero otherwise (:646-651)
        if self.in_chans == 3:
            mean = (0.4488, 0.4371, 0.4040)
        else:
            mean = (0.0,) * self.in_chans
        x, orig_hw = pad_to_window_multiple(x, self.window_size)
        x = (x - jnp.asarray(mean, x.dtype)) * self.img_range

        def forward_features(feat):
            tokens, x_size = to_tokens(feat)
            if self.patch_norm and self.layer_norm:
                tokens = LayerNorm(dtype=self.dtype, name="patch_embed_norm")(tokens)
            if self.ape:
                ape = self.param("absolute_pos_embed", trunc_normal_init,
                                 (1, tokens.shape[1], self.embed_dim))
                tokens = tokens + ape
            tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=deterministic)
            # static schedule: np (not jnp) so float(d) works under jit
            import numpy as np

            dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
            for i, depth in enumerate(self.depths):
                start = sum(self.depths[:i])
                tokens = RSTB(
                    dim=self.embed_dim, depth=depth, num_heads=self.num_heads[i],
                    window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=tuple(float(d) for d in dpr[start : start + depth]),
                    resi_connection=self.resi_connection,
                    build_resolution=self.build_resolution,
                    layer_norm=self.layer_norm,
                    dtype=self.dtype, name=f"layers_{i}",
                )(tokens, x_size, deterministic)
            if self.layer_norm:
                tokens = LayerNorm(dtype=self.dtype, name="norm")(tokens)
            return to_image(tokens, x_size)

        lrelu = activation("leaky_relu", 0.2)
        if self.upsampler == "pixelshuffle":
            x = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            x = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(forward_features(x)) + x
            x = activation("leaky_relu", 0.01)(
                Conv(self.num_feat, 3, dtype=self.dtype, name="conv_before_upsample")(x))
            import math

            if (self.upscale & (self.upscale - 1)) == 0:
                for i in range(int(math.log2(self.upscale))):
                    x = Conv(4 * self.num_feat, 3, dtype=self.dtype, name=f"upsample_{i}")(x)
                    x = pixel_shuffle(x, 2)
            elif self.upscale == 3:
                x = Conv(9 * self.num_feat, 3, dtype=self.dtype, name="upsample_0")(x)
                x = pixel_shuffle(x, 3)
            else:  # the reference Upsample raises too (common.py UpSampler)
                raise ValueError(
                    f"pixelshuffle upsampler supports scale 2^n or 3, "
                    f"got {self.upscale}")
            x = Conv(self.in_chans, 3, dtype=self.dtype, name="conv_last")(x)
        elif self.upsampler == "pixelshuffledirect":
            x = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            x = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(forward_features(x)) + x
            x = Conv((self.upscale**2) * self.in_chans, 3, dtype=self.dtype, name="upsample_conv")(x)
            x = pixel_shuffle(x, self.upscale)
        elif self.upsampler == "nearest+conv":
            assert self.upscale == 4, "only support x4 now."
            x = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            x = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(forward_features(x)) + x
            x = activation("leaky_relu", 0.01)(
                Conv(self.num_feat, 3, dtype=self.dtype, name="conv_before_upsample")(x))
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = lrelu(Conv(self.num_feat, 3, dtype=self.dtype, name="conv_up1")(x))
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = lrelu(Conv(self.num_feat, 3, dtype=self.dtype, name="conv_up2")(x))
            x = Conv(self.in_chans, 3, dtype=self.dtype, name="conv_last")(
                lrelu(Conv(self.num_feat, 3, dtype=self.dtype, name="conv_hr")(x)))
        else:  # denoise / artifact removal: global input residual
            first = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
            res = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(forward_features(first)) + first
            x = x + Conv(self.in_chans, 3, dtype=self.dtype, name="conv_last")(res)

        x = x / self.img_range + jnp.asarray(mean, x.dtype)
        scale = self.upscale if self.upsampler in ("pixelshuffle", "pixelshuffledirect", "nearest+conv") else 1
        return x[:, : orig_hw[0] * scale, : orig_hw[1] * scale, :]


def make_swinir(paras, mean=None, std=None, dtype=jnp.float32) -> SwinIR:
    """Factory reading the sir_* config keys (swin_transformer_sr.py:829-868)."""
    img_size = int(paras.patch_size // paras.sr_scale // paras.sir_window_size + 1) * paras.sir_window_size
    return SwinIR(
        build_resolution=(img_size, img_size),
        in_chans=paras.input_channel,
        embed_dim=paras.sir_embed_dim,
        depths=tuple(paras.sir_swintr_layers),
        num_heads=tuple(paras.sir_num_heads),
        window_size=paras.sir_window_size,
        mlp_ratio=paras.sir_hidden_ratio,
        qkv_bias=paras.sir_qkv_bias,
        qk_scale=paras.sir_qk_scale,
        drop_rate=paras.sir_drop_rate,
        attn_drop_rate=paras.sir_attn_drop_rate,
        drop_path_rate=paras.sir_drop_path_rate,
        ape=paras.sir_ape,
        patch_norm=paras.sir_patch_norm,
        layer_norm=bool(paras.get("sir_layer_norm", True)),
        upscale=int(paras.sr_scale),
        img_range=paras.sir_img_range,
        upsampler=paras.sir_upsampler,
        resi_connection=paras.sir_res_connection,
        dtype=dtype,
    )
