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


def _attention_kernel(scale, nH, q_ref, k_ref, v_ref, b_ref, o_ref):
    for h in range(nH):
        q = q_ref[0, h]  # (N, hd)
        k = k_ref[0, h]
        v = v_ref[0, h]
        attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        attn = attn + b_ref[0, h].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        o_ref[0, h] = jnp.dot(attn, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_attention(q, k, v, bias, *, interpret: bool = False):
    """softmax(scale·qkᵀ + bias) @ v per (window, head).

    q/k/v: (B_, nH, N, hd); bias: (nW, nH, N, N) with B_ % nW == 0.
    """
    b_, nh, n, hd = q.shape
    nw = bias.shape[0]
    assert b_ % nw == 0, "window batch must be a multiple of the mask period"
    scale = hd**-0.5

    kernel = functools.partial(_attention_kernel, scale, nh)
    block = pl.BlockSpec((1, nh, n, hd), lambda i: (i, 0, 0, 0))
    bias_block = pl.BlockSpec((1, nh, n, n), lambda i: (i % nw, 0, 0, 0))
    kwargs = {}
    if pltpu is not None and not interpret:
        block = pl.BlockSpec((1, nh, n, hd), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        bias_block = pl.BlockSpec((1, nh, n, n), lambda i: (i % nw, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b_,),
        in_specs=[block, block, block, bias_block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        **kwargs,
    )(q, k, v, bias)


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
