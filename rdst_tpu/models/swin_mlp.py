"""Swin-MLP SR (/root/reference/networks/swin_mlp_sr.py).

The reference file carries the upstream Swin-MLP *classification* model
(avg-pool + 1000-class head, never wired into any SR trainer). Here the
SwinMLPBlock is implemented faithfully — spatial token mixing as a
grouped per-head linear over shifted windows (zero-pad shift, not roll;
swin_mlp_sr.py:110-155) — and exposed through an SR wrapper with SwinIR
topology (conv head -> residual Swin-MLP groups -> PixelShuffle tail)
so the family is actually trainable for SR.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.models.rdst import pad_to_window_multiple, to_image, to_tokens
from rdst_tpu.nn.common import Conv, UpSampler
from rdst_tpu.nn.layers import DropPath, LayerNorm, Mlp, trunc_normal_init
from rdst_tpu.nn.swin import window_partition, window_reverse


class SwinMLPBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size: Tuple[int, int], deterministic: bool = True):
        h, w = x_size
        b, l, c = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            shift = 0
            ws = min(h, w)

        shortcut = x
        x = LayerNorm(dtype=self.dtype, name="norm1")(x).reshape(b, h, w, c)

        # zero-pad shift (not cyclic roll): P_l = ws - shift, P_r = shift
        if shift > 0:
            pl, pr = ws - shift, shift
            x = jnp.pad(x, ((0, 0), (pl, pr), (pl, pr), (0, 0)))
        hh, ww = x.shape[1:3]

        windows = window_partition(x, ws).reshape(-1, ws * ws, c)
        # grouped per-head spatial linear: token t' <- sum_t W[h, t', t] token_t
        nh = self.num_heads
        hd = c // nh
        wh = windows.reshape(-1, ws * ws, nh, hd).transpose(0, 2, 1, 3)
        spatial_w = self.param("spatial_mlp_kernel", trunc_normal_init,
                               (nh, ws * ws, ws * ws))
        spatial_b = self.param("spatial_mlp_bias", nn.initializers.zeros,
                               (nh, ws * ws))
        mixed = jnp.einsum("bhtd,hst->bhsd", wh, spatial_w) + spatial_b[None, :, :, None]
        mixed = mixed.transpose(0, 2, 1, 3).reshape(-1, ws, ws, c)

        x = window_reverse(mixed, ws, hh, ww)
        if shift > 0:
            pl, pr = ws - shift, shift
            x = x[:, pl : hh - pr, pl : ww - pr, :]
        x = x.reshape(b, h * w, c)

        dp = DropPath(self.drop_path)
        x = shortcut + dp(x, deterministic)
        y = Mlp(hidden_features=int(self.dim * self.mlp_ratio), drop=self.drop,
                dtype=self.dtype, name="mlp")(
            LayerNorm(dtype=self.dtype, name="norm2")(x), deterministic)
        return x + dp(y, deterministic)


class SwinMLPSR(nn.Module):
    in_chans: int = 1
    embed_dim: int = 60
    depths: Sequence[int] = (4, 4, 4)
    num_heads: Sequence[int] = (4, 4, 4)
    window_size: int = 8
    mlp_ratio: float = 2.0
    upscale: int = 4
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        x, orig_hw = pad_to_window_multiple(x, self.window_size)
        x = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        tokens, x_size = to_tokens(x)
        k = 0
        total = sum(self.depths)
        for g, depth in enumerate(self.depths):
            group_in = tokens
            for i in range(depth):
                tokens = SwinMLPBlock(
                    dim=self.embed_dim, num_heads=self.num_heads[g],
                    window_size=self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, drop=self.drop_rate,
                    drop_path=self.drop_path_rate * k / max(total - 1, 1),
                    dtype=self.dtype, name=f"group_{g}_block_{i}",
                )(tokens, x_size, deterministic)
                k += 1
            img = Conv(self.embed_dim, 3, dtype=self.dtype, name=f"group_{g}_conv")(
                to_image(tokens, x_size))
            tokens = to_tokens(img)[0] + group_in
        y = LayerNorm(dtype=self.dtype, name="norm")(tokens)
        y = Conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(
            to_image(y, x_size)) + x
        out = UpSampler(self.upscale, self.embed_dim, dtype=self.dtype, name="tail_up")(y)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name="tail_conv")(out)
        return out[:, : orig_hw[0] * self.upscale, : orig_hw[1] * self.upscale, :]


def make_swinmlp(paras, mean=None, std=None, dtype=jnp.float32) -> SwinMLPSR:
    return SwinMLPSR(
        in_chans=paras.input_channel,
        embed_dim=paras.get("swinmlp_embed_dim", 60),
        depths=tuple(paras.get("swinmlp_depths", (4, 4, 4))),
        num_heads=tuple(paras.get("swinmlp_num_heads", (4, 4, 4))),
        window_size=paras.get("swinmlp_window_size", 8),
        mlp_ratio=paras.get("swinmlp_mlp_ratio", 2.0),
        upscale=int(paras.sr_scale),
        drop_rate=paras.get("swin_drop_rate", 0.0),
        drop_path_rate=paras.get("swin_drop_path_rate", 0.0),
        dtype=dtype,
    )
