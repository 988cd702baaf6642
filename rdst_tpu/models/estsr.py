"""ESTSR — residual-in-residual dense Swin transformer SR
(/root/reference/networks/swinIR_variations.py:349-596).

MeanShift -> head conv -> num_rrdb_blocks x RRDSTB -> LayerNorm ->
scaled global residual -> PixelShuffle (or MetaUpSampler) tail.

Faithfulness notes: the reference declares a ``conv_after_body`` but its
forward never applies it (swinIR_variations.py:518-527 vs :577-583), so
it is not declared here; the network is unreachable from the reference's
configs (SURVEY §2.9) — provided for completeness with a config-keyed
factory and registered as feature_generator 'estsr'.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.models.rdst import _lcm_all, RRDSTB, pad_to_window_multiple, to_image, to_tokens
from rdst_tpu.nn.common import Conv, UpSampler, mean_shift
from rdst_tpu.nn.layers import LayerNorm, trunc_normal_init


class ESTSR(nn.Module):
    in_chans: int = 1
    sr_scale: int = 2
    embed_dim: int = 60
    dense_layer_depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: Sequence[int] = (4, 4, 4, 4)
    rdb_depths: Sequence[int] = (3, 3, 3, 3)
    rrdb_depths: Sequence[int] = (3, 3, 3, 3)
    num_rrdb_blocks: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop: float = 0.0
    ape: bool = False
    patch_norm: bool = True
    resi_connection: str = "1conv"
    growth_rate: int = 30
    dense_scale: float = 1.0
    dim_modify_mode: str = "tail"
    rdb_residual_scale: float = 1.0
    rrdb_residual_scale: float = 1.0
    global_res_scale: float = 1.0
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    scale_free: bool = False
    pre_norm: bool = False
    build_resolution: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        nb = self.num_rrdb_blocks
        x, orig_hw = pad_to_window_multiple(x, _lcm_all(self.window_size))
        x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.embed_dim, 3, dtype=self.dtype, name="head")(x)

        tokens, x_size = to_tokens(x)
        if self.patch_norm:
            tokens = LayerNorm(dtype=self.dtype, name="patch_embed_norm")(tokens)
        if self.ape:
            ape = self.param("absolute_pos_embed", trunc_normal_init,
                             (1, tokens.shape[1], self.embed_dim))
            tokens = tokens + ape
        tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=deterministic)

        for i in range(nb):
            tokens = RRDSTB(
                input_dim=self.embed_dim,
                num_rdstb=self.rrdb_depths[i % len(self.rrdb_depths)],
                layer_depth=self.dense_layer_depths[i % len(self.dense_layer_depths)],
                num_heads=self.num_heads[i % len(self.num_heads)],
                window_size=self.window_size[i % len(self.window_size)],
                mlp_ratio=self.mlp_ratio,
                resi_connection=self.resi_connection,
                growth_rate=self.growth_rate, dense_scale=self.dense_scale,
                dim_modify_mode=self.dim_modify_mode,
                rdb_depth=self.rdb_depths[i % len(self.rdb_depths)],
                rdb_residual_scale=self.rdb_residual_scale,
                residual_scale=self.rrdb_residual_scale,
                pre_norm=self.pre_norm,
                build_resolution=self.build_resolution,
                dtype=self.dtype, name=f"body_{i}",
            )(tokens, x_size, deterministic)

        tokens = LayerNorm(dtype=self.dtype, name="norm")(tokens)
        res = to_image(tokens, x_size) * self.global_res_scale + x

        if self.scale_free:
            from rdst_tpu.models.meta_upscale import MetaUpSampler

            out = MetaUpSampler(self.in_chans, dtype=self.dtype,
                                name="tail_meta")(res, sr_scale)
            out = mean_shift(out, self.mean, self.std, "add")
            s_f = float(sr_scale if sr_scale is not None else self.sr_scale)
            return out[:, : int(orig_hw[0] * s_f), : int(orig_hw[1] * s_f), :]
        out = res
        if self.sr_scale > 1:
            out = UpSampler(self.sr_scale, self.embed_dim, dtype=self.dtype,
                            name="tail_up")(out)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(out)
        out = mean_shift(out, self.mean, self.std, "add")
        return out[:, : orig_hw[0] * self.sr_scale, : orig_hw[1] * self.sr_scale, :]


def make_estsr(paras, mean=None, std=None, dtype=jnp.float32) -> ESTSR:
    """Factory keyed off the rdst_* config names plus estsr_* overrides
    (the reference ships no ESTSR factory — it is unreachable from its
    configs; defaults follow the class defaults above)."""
    c = paras.input_channel
    return ESTSR(
        in_chans=c,
        sr_scale=int(paras.sr_scale),
        embed_dim=paras.rdst_embed_dim,
        dense_layer_depths=tuple(paras.rdst_dense_layer_depths),
        num_heads=tuple(paras.rdst_num_heads),
        window_size=tuple(paras.rdst_window_size),
        rdb_depths=tuple(paras.rdst_rdb_depths),
        rrdb_depths=tuple(paras.get("estsr_rrdb_depths",
                                    [3] * len(paras.rdst_rdb_depths))),
        num_rrdb_blocks=int(paras.get("estsr_num_rrdb_blocks",
                                      len(paras.rdst_rdb_depths))),
        mlp_ratio=paras.swin_hidden_ratio,
        qkv_bias=paras.swin_qkv_bias,
        qk_scale=paras.swin_qk_scale,
        drop_rate=paras.swin_drop_rate,
        attn_drop=paras.swin_attn_drop_rate,
        ape=paras.rdst_ape,
        patch_norm=paras.rdst_patch_norm,
        resi_connection=paras.rdst_res_connection,
        growth_rate=paras.rdst_growth_rate,
        dense_scale=paras.rdst_dense_scale,
        dim_modify_mode=paras.rdst_dim_modify_mode,
        rdb_residual_scale=paras.rdst_rdb_residual_scale,
        rrdb_residual_scale=float(paras.get("estsr_rrdb_residual_scale", 1.0)),
        global_res_scale=paras.rdst_global_res_scale,
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        scale_free=paras.scale_free,
        pre_norm=paras.rdst_pre_norm,
        build_resolution=(paras.patch_size // paras.swin_patch_size,) * 2,
        dtype=dtype,
    )
