"""IPT — pre-trained image-processing transformer for SR
(/root/reference/networks/ipt.py:15-357, a Huawei IPT port).

Per-scale conv heads/tails (one per entry of all_sr_scales) around a
shared encoder-decoder transformer over patch_dim x patch_dim tokens of
the fixed LR training patch; learned positional encoding and per-task
(per-scale) learned queries. Bias-free multihead attention, pre-LN,
ReLU FFN (torch nn.MultiheadAttention(bias=False) semantics).

The token sequence is (B, L, D) (batch-major; the reference uses
length-major — identical math).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.nn.common import Conv, ResBlock, UpSampler, mean_shift
from rdst_tpu.nn.layers import LayerNorm, trunc_normal_init, resolve_act


class MultiheadAttention(nn.Module):
    """Bias-free MHA (torch nn.MultiheadAttention(bias=False))."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True):
        hd = self.dim // self.num_heads

        def proj(x, name):
            y = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name=name)(x)
            b, l, _ = y.shape
            return y.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh = proj(q, "q_proj") * (hd**-0.5)
        kh = proj(k, "k_proj")
        vh = proj(v, "v_proj")
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        kernel_init=trunc_normal_init, name="out_proj")(out)


class EncoderLayer(nn.Module):
    dim: int
    num_heads: int
    hidden_dim: int
    dropout: float = 0.0
    no_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, deterministic: bool = True):
        norm = (lambda n: (lambda x: x)) if self.no_norm else (
            lambda n: LayerNorm(dtype=self.dtype, name=n))
        src2 = norm("norm1")(src)
        qk = src2 if pos is None else src2 + pos
        src2 = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype,
                                  name="self_attn")(qk, qk, src2, deterministic)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src2 = norm("norm2")(src)
        src2 = nn.Dense(self.hidden_dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init, name="linear1")(src2)
        src2 = jax.nn.relu(src2)
        src2 = nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src2 = nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init, name="linear2")(src2)
        return src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)


class DecoderLayer(nn.Module):
    dim: int
    num_heads: int
    hidden_dim: int
    dropout: float = 0.0
    no_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None, deterministic: bool = True):
        norm = (lambda n: (lambda x: x)) if self.no_norm else (
            lambda n: LayerNorm(dtype=self.dtype, name=n))

        def with_pos(x, p):
            return x if p is None else x + p

        tgt2 = norm("norm1")(tgt)
        qk = with_pos(tgt2, query_pos)
        tgt2 = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype,
                                  name="self_attn")(qk, qk, tgt2, deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt2 = norm("norm2")(tgt)
        tgt2 = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype,
                                  name="multihead_attn")(
            with_pos(tgt2, query_pos), with_pos(memory, pos), memory, deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt2 = norm("norm3")(tgt)
        tgt2 = nn.Dense(self.hidden_dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init, name="linear1")(tgt2)
        tgt2 = jax.nn.relu(tgt2)
        tgt2 = nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt2 = nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init, name="linear2")(tgt2)
        return tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)


class IPTBody(nn.Module):
    """VisionTransformer over patch tokens (ipt.py:111-219)."""

    img_dim: int
    patch_dim: int
    num_channels: int
    num_heads: int
    num_layers: int
    num_queries: int
    dropout: float = 0.0
    no_norm: bool = False
    no_mlp: bool = False
    pos_every: bool = False
    no_pos: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query_idx: int, deterministic: bool = True):
        b, h, w, c = x.shape
        pd = self.patch_dim
        dim = c * pd * pd
        hidden = dim * 4
        lh, lw = h // pd, w // pd
        seq = lh * lw

        # unfold into non-overlapping pd x pd tokens (torch (C,ph,pw) layout)
        tokens = x.reshape(b, lh, pd, lw, pd, c)
        tokens = tokens.transpose(0, 1, 3, 5, 2, 4).reshape(b, seq, dim)

        if not self.no_mlp:
            enc = nn.Dense(dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                           name="linear_encoding")(tokens)
            tokens = nn.Dropout(self.dropout)(enc, deterministic=deterministic) + tokens
            query_table = self.param(
                "query_embed", trunc_normal_init, (self.num_queries, seq * dim))
            query = query_table[query_idx].reshape(1, seq, dim)
            query = jnp.broadcast_to(query, (b, seq, dim))
        else:
            query = None

        pos = None
        if not self.no_pos:
            pe = self.param("position_encoding", trunc_normal_init, (seq, dim))
            pos = pe[None]

        y = tokens
        if self.pos_every:
            for i in range(self.num_layers):
                y = EncoderLayer(dim, self.num_heads, hidden, self.dropout,
                                 self.no_norm, dtype=self.dtype,
                                 name=f"encoder_{i}")(y, pos, deterministic)
            memory = y
            for i in range(self.num_layers):
                y = DecoderLayer(dim, self.num_heads, hidden, self.dropout,
                                 self.no_norm, dtype=self.dtype,
                                 name=f"decoder_{i}")(y, memory, pos, query, deterministic)
        else:
            if not self.no_pos:
                y = y + pos
            for i in range(self.num_layers):
                y = EncoderLayer(dim, self.num_heads, hidden, self.dropout,
                                 self.no_norm, dtype=self.dtype,
                                 name=f"encoder_{i}")(y, None, deterministic)
            memory = y
            for i in range(self.num_layers):
                y = DecoderLayer(dim, self.num_heads, hidden, self.dropout,
                                 self.no_norm, dtype=self.dtype,
                                 name=f"decoder_{i}")(y, memory, None, query, deterministic)

        if not self.no_mlp:
            h1 = nn.Dense(hidden, dtype=self.dtype, kernel_init=trunc_normal_init,
                          name="mlp_head_0")(y)
            h1 = nn.Dropout(self.dropout)(h1, deterministic=deterministic)
            h1 = jax.nn.relu(h1)
            h1 = nn.Dense(dim, dtype=self.dtype, kernel_init=trunc_normal_init,
                          name="mlp_head_1")(h1)
            h1 = nn.Dropout(self.dropout)(h1, deterministic=deterministic)
            y = h1 + y

        # fold back to image
        y = y.reshape(b, lh, lw, c, pd, pd).transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(b, h, w, c)


class IPT(nn.Module):
    in_chans: int = 1
    sr_scales: Sequence[float] = (4.0,)
    n_feats: int = 64
    patch_dim: int = 3
    num_heads: int = 12
    num_layers: int = 12
    num_queries: int = 3
    dropout: float = 0.0
    no_norm: bool = False
    no_mlp: bool = False
    pos_every: bool = False
    no_pos: bool = False
    act: str = "relu"
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=None, deterministic: bool = True):
        import numpy as np

        if sr_scale is None:
            sr_scale = self.sr_scales[0]
        if hasattr(sr_scale, "ndim"):
            sr_scale = float(np.asarray(sr_scale).reshape(-1)[0])
        si = list(self.sr_scales).index(float(sr_scale))

        x = mean_shift(x, self.mean, self.std, "sub")
        y = Conv(self.n_feats, 3, dtype=self.dtype, name=f"head_{si}_conv")(x)
        y = ResBlock(self.n_feats, 5, self.act, dtype=self.dtype, name=f"head_{si}_res0")(y)
        y = ResBlock(self.n_feats, 5, self.act, dtype=self.dtype, name=f"head_{si}_res1")(y)

        res = IPTBody(
            img_dim=y.shape[1], patch_dim=self.patch_dim, num_channels=self.n_feats,
            num_heads=self.num_heads, num_layers=self.num_layers,
            num_queries=self.num_queries, dropout=self.dropout,
            no_norm=self.no_norm, no_mlp=self.no_mlp,
            pos_every=self.pos_every, no_pos=self.no_pos,
            dtype=self.dtype, name="body",
        )(y, si, deterministic)
        res = res + y

        out = UpSampler(int(sr_scale), self.n_feats, dtype=self.dtype,
                        name=f"tail_{si}_up")(res)
        out = Conv(self.in_chans, 3, dtype=self.dtype, name=f"tail_{si}_conv")(out)
        return mean_shift(out, self.mean, self.std, "add")


def make_ipt(paras, mean=None, std=None, dtype=jnp.float32) -> IPT:
    c = paras.input_channel
    return IPT(
        in_chans=c,
        sr_scales=tuple(paras.all_sr_scales),
        n_feats=paras.ipt_n_feats,
        patch_dim=paras.ipt_patch_dim,
        num_heads=paras.ipt_num_heads,
        num_layers=paras.ipt_num_layers,
        num_queries=paras.ipt_num_queries,
        dropout=paras.ipt_dropout_rate,
        no_norm=paras.ipt_no_norm,
        no_mlp=paras.ipt_no_mlp,
        pos_every=paras.ipt_pos_every,
        no_pos=paras.ipt_no_pos,
        act=resolve_act(paras, paras.ipt_act),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
