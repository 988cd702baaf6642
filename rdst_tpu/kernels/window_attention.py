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

The kernel is gated: `rdst_tpu.kernels.USE_PALLAS_ATTENTION` (env
RDST_TPU_PALLAS=1) — models fall back to the pure-XLA path otherwise,
which the microbenchmark in tests/perf can compare against.
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


USE_PALLAS_ATTENTION = os.environ.get("RDST_TPU_PALLAS", "0") == "1"
