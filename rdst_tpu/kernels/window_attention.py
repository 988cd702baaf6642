"""Fused windowed-attention core (Pallas TPU).

The innermost hot loop of RDST/SwinIR is window attention over
N = window² = 64-token windows (48 calls per RDST-E1 forward,
SURVEY §3.3). This kernel fuses  scale·q@kᵀ + rel-bias(+shift-mask) +
softmax + @v  per window so the (B·nW, heads, 64, 64) attention tensor
never round-trips HBM; qkv/proj projections stay outside where XLA
already emits one large MXU matmul.

Layout: q/k/v (B_, nH, N, hd); the combined bias (relative-position
bias + optional shift mask) is (nW, nH, N, N) and is indexed modulo nW
through the BlockSpec index_map (windows repeat per image).

Gating + measurements (v5e-lite, RDST-E1, OASIS x4, bf16, 128-slice
volumes): XLA fusion 669 slices/s; attention-only kernel
(RDST_TPU_PALLAS=1) 377; fused qkv+attn+proj block kernel
(RDST_TPU_PALLAS=block) 503. Per-head hd=10..25 matmuls serialize
poorly against XLA's giant batched GEMMs, so THESE two round-1 kernels
stay opt-in; the production default is the whole-block DSTL-pair kernel
in kernels/swin_block.py (2475 slices/s — see pallas_mode below).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only namespace; interpret mode works everywhere
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _attention_kernel(scale, nH, T, q_ref, k_ref, v_ref, b_ref, o_ref):
    # tile: T windows x all heads; attention intermediates live in VMEM
    for h in range(nH):
        q = q_ref[0, h]  # (T, N, hd)
        k = k_ref[0, h]
        v = v_ref[0, h]
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (T, N, N)
        attn = attn + b_ref[0, h].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        o_ref[0, h] = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_attention(q, k, v, bias, *, interpret: bool = False):
    """softmax(scale·qkᵀ + bias) @ v per (window, head).

    q/k/v: (B_, nH, N, hd); bias: (nW, nH, N, N) with B_ % nW == 0.
    One grid program handles all nW windows of one image (batched small
    matmuls in VMEM), so the (B_, nH, N, N) attention tensor never
    touches HBM.
    """
    b_, nh, n, hd = q.shape
    nw = bias.shape[0]
    assert b_ % nw == 0, "window batch must be a multiple of the mask period"
    scale = hd**-0.5
    t = nw  # windows per program = one image's windows (mask-aligned)
    grid = (b_ // t,)

    # regroup to (B, nH, T, N, hd): heads-major so per-head tiles are contiguous
    def regroup(x):
        return x.reshape(b_ // t, t, nh, n, -1).transpose(0, 2, 1, 3, 4)

    qg, kg, vg = regroup(q), regroup(k), regroup(v)
    bias_g = bias.transpose(1, 0, 2, 3)[None]  # (1, nH, nW, N, N)

    kernel = functools.partial(_attention_kernel, scale, nh, t)
    vm = {} if (pltpu is None or interpret) else {"memory_space": pltpu.VMEM}
    block = pl.BlockSpec((1, nh, t, n, hd), lambda i: (i, 0, 0, 0, 0), **vm)
    bias_block = pl.BlockSpec((1, nh, t, n, n), lambda i: (0, 0, 0, 0, 0), **vm)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, block, bias_block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        interpret=interpret,
    )(qg, kg, vg, bias_g)
    return out.transpose(0, 2, 1, 3, 4).reshape(b_, nh, n, hd)


def reference_window_attention(q, k, v, bias):
    """Pure-XLA reference path (identical math)."""
    b_, nh, n, hd = q.shape
    nw = bias.shape[0]
    scale = hd**-0.5
    attn = (q * scale) @ k.transpose(0, 1, 3, 2)
    attn = attn.reshape(b_ // nw, nw, nh, n, n) + bias[None]
    attn = jax.nn.softmax(attn.reshape(b_, nh, n, n), axis=-1)
    return attn @ v


def pallas_mode():
    """'rdstb' (default: whole-RDSTB mega-kernel where it fits — 2891
    slices/s at RDST-E1 shapes, v5e-lite — with DSTL-pair then
    single-block fused fallbacks for non-RDSTB structures) | 'pair'
    (DSTL-pair fused, 2475) | 'swin' (single fused whole-block, 2178) |
    'pack' (two windows per lane row at C<=64 — SLOWER at RDST-E1
    shapes: 1968) | '1' (attention-only) | 'block' (fused
    qkv+attn+proj) | '0'/'off' (pure XLA, 669).

    '1' and 'block' were the round-1 experiments and measured SLOWER
    than XLA fusion (377 / 503 vs 669 slices/s) — kept for
    re-measurement at other shapes."""
    mode = os.environ.get("RDST_TPU_PALLAS", "")
    if mode in ("0", "false", "off"):
        return ""
    return mode or "rdstb"


def pallas_interpret() -> bool:
    """Force interpret-mode kernels (CPU tests of the gated path)."""
    return os.environ.get("RDST_TPU_PALLAS_INTERPRET", "0") == "1"


def _block_kernel(scale, nH, hd, x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                  b_ref, o_ref):
    """Whole attention block per tile: qkv proj -> attention -> out proj.

    x: (1, T*N, C); wqkv: (3, nH, C, hd); bqkv: (3, nH, hd);
    wproj: (nH, hd, C); bproj: (1, C); bias: (1, nH, T, N, N).
    """
    x = x_ref[0]  # (T*N, C)
    tn, c = x.shape
    t = b_ref.shape[2]
    n = tn // t
    acc = jnp.zeros((tn, c), jnp.float32)
    for h in range(nH):
        q = jnp.dot(x, wqkv_ref[0, h], preferred_element_type=jnp.float32) + bqkv_ref[0, h]
        k = jnp.dot(x, wqkv_ref[1, h], preferred_element_type=jnp.float32) + bqkv_ref[1, h]
        v = jnp.dot(x, wqkv_ref[2, h], preferred_element_type=jnp.float32) + bqkv_ref[2, h]
        q = q.reshape(t, n, hd)
        k = k.reshape(t, n, hd)
        v = v.reshape(t, n, hd)
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        attn = attn + b_ref[0, h].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        oh = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(tn, hd)
        acc = acc + jnp.dot(oh, wproj_ref[h], preferred_element_type=jnp.float32)
    o_ref[0] = (acc + bproj_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_attention_block(x_windows, wqkv, bqkv, wproj, bproj, bias, *,
                          num_heads: int, interpret: bool = False):
    """Full window-attention block (qkv -> attn -> proj) in one kernel.

    x_windows: (B_, N, C); wqkv: (C, 3C); bqkv: (3C,) or None;
    wproj: (C, C); bproj: (C,); bias: (nW, nH, N, N).
    Returns (B_, N, C). The (B_, nH, N, N) attention tensor, q/k/v, and
    the pre-proj head outputs never touch HBM.
    """
    b_, n, c = x_windows.shape
    nw, nh = bias.shape[:2]
    hd = c // num_heads
    assert b_ % nw == 0
    scale = hd**-0.5
    t = nw
    grid = (b_ // t,)

    # (C, 3C) with output layout (3, nH, hd) fastest-last -> (3, nH, C, hd)
    wqkv_r = wqkv.reshape(c, 3, nh, hd).transpose(1, 2, 0, 3)
    if bqkv is None:
        bqkv_r = jnp.zeros((3, nh, hd), wqkv.dtype)
    else:
        bqkv_r = bqkv.reshape(3, nh, hd)
    wproj_r = wproj.reshape(nh, hd, c)
    bias_r = bias.transpose(1, 0, 2, 3)[None]  # (1, nH, nW, N, N)
    xg = x_windows.reshape(b_ // t, t * n, c)

    kernel = functools.partial(_block_kernel, scale, nh, hd)
    vm = {} if (pltpu is None or interpret) else {"memory_space": pltpu.VMEM}
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t * n, c), lambda i: (i, 0, 0), **vm),
            pl.BlockSpec((3, nh, c, hd), lambda i: (0, 0, 0, 0), **vm),
            pl.BlockSpec((3, nh, hd), lambda i: (0, 0, 0), **vm),
            pl.BlockSpec((nh, hd, c), lambda i: (0, 0, 0), **vm),
            pl.BlockSpec((1, c), lambda i: (0, 0), **vm),
            pl.BlockSpec((1, nh, t, n, n), lambda i: (0, 0, 0, 0, 0), **vm),
        ],
        out_specs=pl.BlockSpec((1, t * n, c), lambda i: (i, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct(xg.shape, x_windows.dtype),
        interpret=interpret,
    )(xg, wqkv_r, bqkv_r, wproj_r, bproj.reshape(1, c), bias_r)
    return out.reshape(b_, n, c)
