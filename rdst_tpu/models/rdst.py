"""RDST — Residual Dense Swin Transformer SR (the flagship model).

TPU-native re-design of the reference RDSTSR
(/root/reference/networks/swinIR_variations.py:21-236, 890-1141):

* DenseSTLayer (DSTL): 2 Swin blocks (shift 0 / ws//2) + linear dim
  adapter at 'head'/'tail' + dense channel concat;
* RDSTB: num_blocks DSTLs with input dim growing by growth_rate, then a
  3x3 conv bottleneck back to embed_dim and a scaled residual;
* RDSTSR: mean-shift → head conv → N×RDSTB over tokens → LayerNorm →
  optional conv_after_body → global residual → PixelShuffle tail.

Layouts are NHWC / (B, L, C) tokens; all shape-dependent masks resolve
at trace time. Module names mirror the reference attribute paths so the
torch-checkpoint importer is a mechanical key translation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv, UpSampler, mean_shift
from rdst_tpu.nn.layers import LayerNorm, activation, trunc_normal_init
from rdst_tpu.nn.swin import BasicLayer


def to_tokens(x: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B,H,W,C) -> ((B,L,C), (H,W)); row-major L like torch flatten(2)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c), (h, w)


def to_image(x: jax.Array, x_size: Tuple[int, int]) -> jax.Array:
    b, l, c = x.shape
    return x.reshape(b, x_size[0], x_size[1], c)


def _lcm_all(sizes) -> int:
    """LCM of the per-block window sizes: padding to max() alone breaks
    blocks whose window does not divide it (e.g. [6, 4])."""
    import math

    out = 1
    for s in sizes:
        out = math.lcm(out, int(s))
    return out


def pad_to_window_multiple(x: jax.Array, multiple: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """Reflect-pad H,W up to a window multiple (the reference crashes on
    non-multiple whole-slice inputs; we pad and crop the output instead)."""
    b, h, w, c = x.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return x, (h, w)


class _RawConvParams(nn.Module):
    """Declares kernel/bias at nn.Conv's leaf paths."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        from rdst_tpu.nn.common import torch_conv_init

        k = self.param("kernel", torch_conv_init, self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class _ConvParams(nn.Module):
    """Declares the same two-level tree as common.Conv (conv/kernel,
    conv/bias) without computing — for caller-side fused kernels."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return _RawConvParams(self.shape, name="conv")()


class DenseSTLayer(nn.Module):
    """DSTL (swinIR_variations.py:21-116): Swin pair + dense concat."""

    input_dim: int
    growth_rate: int
    depth: int = 2
    num_heads: int = 6
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dense_scale: float = 1.0
    dim_modify_mode: str = "tail"
    pre_norm: bool = False
    build_resolution: Optional[Tuple[int, int]] = None
    layer_norm: bool = True  # False = reference norm_layer=Identity
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True,
                 params_only: bool = False):
        assert self.growth_rate % self.num_heads == 0
        assert self.input_dim % self.num_heads == 0
        shortcut = x

        hidden_dim = self.growth_rate if self.dim_modify_mode == "head" else self.input_dim
        need_adapter = self.input_dim != self.growth_rate

        if params_only:
            # fused-RDSTB bundle: block kernel inputs + the tail adapter's
            # raw params (declares the identical tree to computing)
            from rdst_tpu.nn.swin import _LayerNormParams, _LinearParams

            blocks = BasicLayer(
                dim=hidden_dim, depth=self.depth, num_heads=self.num_heads,
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop, attn_drop=self.attn_drop,
                drop_path=(self.drop_path,) * self.depth,
                build_resolution=self.build_resolution,
                layer_norm=self.layer_norm,
                dtype=self.dtype, name="body",
            )(None, x_size, params_only=True)
            assert self.dim_modify_mode == "tail" and need_adapter, \
                "fused RDSTB needs tail adapters"
            if self.pre_norm:  # LN(C) then Dense(C->growth)
                ga_, bba_ = _LayerNormParams(hidden_dim, name="tail_0")()
                wa_, ba_ = _LinearParams(hidden_dim, self.growth_rate, True,
                                         name="tail_1")()
            else:  # Dense(C->growth) then LN(growth)
                wa_, ba_ = _LinearParams(hidden_dim, self.growth_rate, True,
                                         name="tail_0")()
                ga_, bba_ = _LayerNormParams(self.growth_rate, name="tail_1")()
            return {"blocks": blocks, "adapter": (wa_, ba_, ga_, bba_)}

        def adapter(y, in_dim, out_dim, name):
            # nn.Sequential([norm, linear]) if pre_norm else [linear, norm]
            if self.pre_norm:
                if self.layer_norm:
                    y = LayerNorm(dtype=self.dtype, name=f"{name}_0")(y)
                y = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                             name=f"{name}_1")(y)
            else:
                y = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                             name=f"{name}_0")(y)
                if self.layer_norm:
                    y = LayerNorm(dtype=self.dtype, name=f"{name}_1")(y)
            return y

        if self.dim_modify_mode == "head" and need_adapter:
            x = adapter(x, self.input_dim, self.growth_rate, "head")

        x = BasicLayer(
            dim=hidden_dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop=self.drop, attn_drop=self.attn_drop,
            drop_path=(self.drop_path,) * self.depth,
            build_resolution=self.build_resolution,
            layer_norm=self.layer_norm,
            dtype=self.dtype, name="body",
        )(x, x_size, deterministic)

        if self.dim_modify_mode == "tail" and need_adapter:
            x = adapter(x, hidden_dim, self.growth_rate, "tail")

        if self.dense_scale != 1.0:  # skip the no-op pass (config ships 1.0)
            x = x * self.dense_scale
        return jnp.concatenate([shortcut, x], axis=2)


class RDSTB(nn.Module):
    """Residual dense block of DSTLs (swinIR_variations.py:129-220)."""

    input_dim: int
    layer_depth: int = 2
    num_heads: int = 6
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    resi_connection: str = "1conv"
    growth_rate: int = 30
    dense_scale: float = 1.0
    dim_modify_mode: str = "tail"
    num_blocks: int = 3
    residual_scale: float = 1.0
    pre_norm: bool = False
    build_resolution: Optional[Tuple[int, int]] = None
    layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    def _use_fused_rdstb(self, x, x_size) -> bool:
        import jax as _jax

        from rdst_tpu.kernels import window_attention as wa
        from rdst_tpu.kernels.rdstb_block import fused_rdstb_fits
        from rdst_tpu.kernels.swin_block import use_fast_path
        from rdst_tpu.nn.swin import resolve_ws_shift

        h, w = x_size
        ws, shift = resolve_ws_shift(self.build_resolution or (h, w), h, w,
                                     self.window_size, self.window_size // 2)
        return (
            wa.pallas_mode() == "rdstb"
            and use_fast_path(self.dtype)
            and self.layer_depth == 2 and self.layer_norm
            and self.resi_connection == "1conv"
            and self.dim_modify_mode == "tail"
            and self.qk_scale is None
            and self.dense_scale == 1.0 and self.residual_scale == 1.0
            and self.input_dim != self.growth_rate
            and self.input_dim % self.num_heads == 0
            and all((self.input_dim + i * self.growth_rate)
                    % self.num_heads == 0
                    for i in range(int(self.num_blocks)))
            and h % ws == 0 and w % ws == 0
            and fused_rdstb_fits(
                (h // ws) * (w // ws), ws * ws, self.input_dim,
                self.growth_rate, int(self.num_blocks), self.num_heads,
                self.mlp_ratio, jnp.dtype(self.dtype).itemsize)
            and (_jax.default_backend() == "tpu" or wa.pallas_interpret())
            and self._fused_rdstb_probe_ok(x_size, ws, shift)
        )

    def _fused_rdstb_probe_ok(self, x_size, ws, shift) -> bool:
        """One cached probe-compile per geometry on real TPU: a VMEM
        over-admit falls back to the pair path instead of dying inside
        Mosaic when the full model compiles (see fused_rdstb_probe)."""
        import os

        import jax as _jax

        from rdst_tpu.kernels import window_attention as wa
        from rdst_tpu.kernels.rdstb_block import fused_rdstb_probe

        if wa.pallas_interpret() or _jax.default_backend() != "tpu":
            return True  # interpret mode never Mosaic-compiles
        h, w = x_size
        from rdst_tpu.kernels.swin_block import quant_flags

        return fused_rdstb_probe(
            (h, w), ws, shift, self.input_dim, self.growth_rate,
            int(self.num_blocks), self.num_heads, self.mlp_ratio,
            self.pre_norm, int(os.environ.get("RDST_TPU_PALLAS_IPP", "1")),
            quant=quant_flags())

    def _fused_rdstb(self, x, x_size):
        """Whole-RDSTB Pallas path: declares the identical param tree
        (DSTL blocks + adapters + bottleneck conv) and runs
        kernels/rdstb_block.fused_rdstb on image-major tokens."""
        import os

        from rdst_tpu.kernels import window_attention as wa
        from rdst_tpu.kernels.rdstb_block import fused_rdstb
        from rdst_tpu.nn.swin import resolve_ws_shift

        h, w = x_size
        ws, shift = resolve_ws_shift(self.build_resolution or (h, w), h, w,
                                     self.window_size, self.window_size // 2)
        dstls = []
        idim = self.input_dim
        for i in range(int(self.num_blocks)):
            dstls.append(DenseSTLayer(
                input_dim=idim, growth_rate=self.growth_rate,
                depth=self.layer_depth, num_heads=self.num_heads,
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop, attn_drop=self.attn_drop,
                drop_path=self.drop_path,
                dense_scale=self.dense_scale,
                dim_modify_mode=self.dim_modify_mode,
                pre_norm=self.pre_norm,
                build_resolution=self.build_resolution,
                layer_norm=self.layer_norm,
                dtype=self.dtype, name=f"body_{i}",
            )(None, x_size, params_only=True))
            idim += self.growth_rate
        wc, bc = _ConvParams((3, 3, idim, self.input_dim), name="conv")()

        # default 1: measured faster than 2 for the mega-kernel
        ipp = int(os.environ.get("RDST_TPU_PALLAS_IPP", "1"))
        from rdst_tpu.kernels.swin_block import quant_flags

        return fused_rdstb(
            x.astype(self.dtype), dstls, wc, bc,
            num_heads=self.num_heads, x_size=(h, w), window_size=ws,
            shift=shift, growth=self.growth_rate,
            adapter_prenorm=self.pre_norm, images_per_program=ipp,
            interpret=wa.pallas_interpret(),
            # resolved HERE so the jit cache keys on the active flags
            # (a trace-time env read inside the cached callee would go
            # stale when the env changes between outer traces)
            quant=quant_flags())

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True):
        if deterministic and self._use_fused_rdstb(x, x_size):
            return self._fused_rdstb(x, x_size)
        shortcut = x
        idim = self.input_dim
        for i in range(int(self.num_blocks)):
            x = DenseSTLayer(
                input_dim=idim, growth_rate=self.growth_rate,
                depth=self.layer_depth, num_heads=self.num_heads,
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop, attn_drop=self.attn_drop, drop_path=self.drop_path,
                dense_scale=self.dense_scale, dim_modify_mode=self.dim_modify_mode,
                pre_norm=self.pre_norm, build_resolution=self.build_resolution,
                layer_norm=self.layer_norm,
                dtype=self.dtype, name=f"body_{i}",
            )(x, x_size, deterministic)
            idim += self.growth_rate

        # conv bottleneck back to input_dim, in image layout
        y = to_image(x, x_size)
        if self.resi_connection == "1conv":
            y = Conv(self.input_dim, 3, dtype=self.dtype, name="conv")(y)
        elif self.resi_connection == "3conv":
            lrelu = activation("leaky_relu", 0.2)
            y = Conv(idim // 4, 3, dtype=self.dtype, name="conv_0")(y)
            y = lrelu(y)
            y = Conv(idim // 4, 1, dtype=self.dtype, name="conv_2")(y)
            y = lrelu(y)
            y = Conv(self.input_dim, 3, dtype=self.dtype, name="conv_4")(y)
        else:
            raise ValueError(f"unknown resi_connection {self.resi_connection}")
        y, _ = to_tokens(y)
        if self.residual_scale != 1.0:
            y = y * self.residual_scale
        return y + shortcut


class RDSTSR(nn.Module):
    """Full RDST SR network (swinIR_variations.py:890-1135)."""

    in_chans: int = 1
    sr_scale: int = 4
    embed_dim: int = 60
    dense_layer_depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: Sequence[int] = (4, 4, 4, 4)
    rdb_depths: Sequence[int] = (3, 3, 3, 3)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    ape: bool = False
    patch_norm: bool = True
    resi_connection: str = "1conv"
    growth_rate: int = 30
    dense_scale: float = 1.0
    dim_modify_mode: str = "tail"
    rdb_residual_scale: float = 1.0
    global_res_scale: float = 1.0
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    scale_free: bool = False
    pre_norm: bool = False
    layer_norm: bool = True  # rdst_layer_norm: False = Identity norms
    feature_last_operation: bool = False
    # constructor-time resolution for the shift clamp decision (the RDST
    # factory passes the LR training patch size, swinIR_variations.py:1149)
    build_resolution: Optional[Tuple[int, int]] = None
    # rdst_remat config key: rematerialize each RDSTB in the backward
    # (jax.checkpoint) — trades ~1 extra forward of FLOPs for dropping
    # the dense-concat activations (the main memory consumer, SURVEY
    # §7.3.6), so bigger geometries/batches train on one chip
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        num_blocks = len(self.rdb_depths)
        assert num_blocks == len(self.window_size) == len(self.num_heads) == len(self.dense_layer_depths)

        x, orig_hw = pad_to_window_multiple(x, _lcm_all(self.window_size))
        x = mean_shift(x, self.mean, self.std, "sub")
        x = Conv(self.embed_dim, 3, dtype=self.dtype, name="head")(x)

        # forward_features over tokens
        tokens, x_size = to_tokens(x)
        if self.patch_norm and self.layer_norm:
            tokens = LayerNorm(dtype=self.dtype, name="patch_embed_norm")(tokens)
        if self.ape:
            ape = self.param("absolute_pos_embed", trunc_normal_init,
                             (1, tokens.shape[1], self.embed_dim))
            tokens = tokens + ape
        tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=deterministic)

        # x_size/deterministic are static python values (reshape shapes /
        # trace-time branches) — they must not become remat tracers
        block_cls = (nn.remat(RDSTB, static_argnums=(2, 3))
                     if self.remat and not deterministic else RDSTB)
        for i in range(num_blocks):
            tokens = block_cls(
                input_dim=self.embed_dim,
                layer_depth=self.dense_layer_depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size[i],
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop,
                resi_connection=self.resi_connection,
                growth_rate=self.growth_rate, dense_scale=self.dense_scale,
                dim_modify_mode=self.dim_modify_mode,
                num_blocks=self.rdb_depths[i],
                residual_scale=self.rdb_residual_scale,
                pre_norm=self.pre_norm, build_resolution=self.build_resolution,
                layer_norm=self.layer_norm,
                dtype=self.dtype, name=f"body_{i}",
            )(tokens, x_size, deterministic)

        if self.layer_norm:
            tokens = LayerNorm(dtype=self.dtype, name="norm")(tokens)
        res = to_image(tokens, x_size)
        if self.global_res_scale != 1.0:
            res = res * self.global_res_scale
        if self.feature_last_operation:
            if self.resi_connection == "1conv":
                res = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(res)
            else:
                lrelu = activation("leaky_relu", 0.2)
                res = Conv(self.embed_dim // 4, 3, dtype=self.dtype, name="conv_after_body_0")(res)
                res = lrelu(res)
                res = Conv(self.embed_dim // 4, 1, dtype=self.dtype, name="conv_after_body_2")(res)
                res = lrelu(res)
                res = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body_4")(res)
        res = res + x

        if self.scale_free:
            from rdst_tpu.models.meta_upscale import MetaUpSampler

            out = MetaUpSampler(self.in_chans, dtype=self.dtype, name="tail_meta")(res, sr_scale)
            out = mean_shift(out, self.mean, self.std, "add")
            # crop away the window-multiple padding (scaled by the real
            # trace-time scale; same semantics as the fixed-scale branch)
            s_f = float(sr_scale if sr_scale is not None else self.sr_scale)
            return out[:, : int(orig_hw[0] * s_f), : int(orig_hw[1] * s_f), :]
        out = res
        if self.sr_scale > 1:
            out = UpSampler(self.sr_scale, self.embed_dim, dtype=self.dtype,
                            name="tail_up")(out)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(out)
        out = mean_shift(out, self.mean, self.std, "add")
        # crop away the window-multiple padding (scaled)
        return out[:, : orig_hw[0] * self.sr_scale, : orig_hw[1] * self.sr_scale, :]


def make_rdst(paras, mean=None, std=None, dtype=jnp.float32) -> RDSTSR:
    """Factory keyed off the reference config names
    (swinIR_variations.py:1144-1232)."""
    if paras.rdst_global_bottleneck:
        from rdst_tpu.models.rdst_n import make_rdst_n

        return make_rdst_n(paras, mean, std, dtype)
    return RDSTSR(
        in_chans=paras.input_channel,
        sr_scale=int(paras.sr_scale),
        embed_dim=paras.rdst_embed_dim,
        dense_layer_depths=tuple(paras.rdst_dense_layer_depths),
        num_heads=tuple(paras.rdst_num_heads),
        window_size=tuple(paras.rdst_window_size),
        rdb_depths=tuple(paras.rdst_rdb_depths),
        mlp_ratio=paras.swin_hidden_ratio,
        qkv_bias=paras.swin_qkv_bias,
        qk_scale=paras.swin_qk_scale,
        drop_rate=paras.swin_drop_rate,
        attn_drop=paras.swin_attn_drop_rate,
        drop_path_rate=paras.swin_drop_path_rate,
        ape=paras.rdst_ape,
        patch_norm=paras.rdst_patch_norm,
        layer_norm=bool(paras.get("rdst_layer_norm", True)),
        resi_connection=paras.rdst_res_connection,
        growth_rate=paras.rdst_growth_rate,
        dense_scale=paras.rdst_dense_scale,
        dim_modify_mode=paras.rdst_dim_modify_mode,
        rdb_residual_scale=paras.rdst_rdb_residual_scale,
        global_res_scale=paras.rdst_global_res_scale,
        mean=tuple(mean) if mean is not None else (0.0,) * paras.input_channel,
        std=tuple(std) if std is not None else (1.0,) * paras.input_channel,
        scale_free=paras.scale_free,
        pre_norm=paras.rdst_pre_norm,
        feature_last_operation=paras.rdst_feature_last_operation,
        build_resolution=(
            paras.patch_size // paras.swin_patch_size,
            paras.patch_size // paras.swin_patch_size,
        ),
        remat=bool(paras.get("rdst_remat", False)),
        dtype=dtype,
    )


class RRDSTB(nn.Module):
    """Residual-in-residual dense Swin block: num_rdstb x RDSTB + conv +
    scaled residual (swinIR_variations.py:239-346; used by the unwired
    ESTSR experiment — provided as a building block)."""

    input_dim: int
    num_rdstb: int = 3
    layer_depth: int = 2
    num_heads: int = 6
    window_size: int = 8
    mlp_ratio: float = 2.0
    resi_connection: str = "1conv"
    growth_rate: int = 30
    dense_scale: float = 1.0
    dim_modify_mode: str = "tail"
    rdb_depth: int = 3
    rdb_residual_scale: float = 1.0
    residual_scale: float = 1.0
    pre_norm: bool = False
    build_resolution: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size, deterministic: bool = True):
        shortcut = x
        for i in range(self.num_rdstb):
            x = RDSTB(
                input_dim=self.input_dim, layer_depth=self.layer_depth,
                num_heads=self.num_heads, window_size=self.window_size,
                mlp_ratio=self.mlp_ratio, resi_connection=self.resi_connection,
                growth_rate=self.growth_rate, dense_scale=self.dense_scale,
                dim_modify_mode=self.dim_modify_mode, num_blocks=self.rdb_depth,
                residual_scale=self.rdb_residual_scale, pre_norm=self.pre_norm,
                build_resolution=self.build_resolution, dtype=self.dtype,
                name=f"body_{i}",
            )(x, x_size, deterministic)
        y = Conv(self.input_dim, 3, dtype=self.dtype, name="conv")(
            to_image(x, x_size))
        return to_tokens(y)[0] * self.residual_scale + shortcut
