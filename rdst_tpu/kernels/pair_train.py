"""Differentiable DSTL-pair kernel: fused Swin-block pairs in the
TRAINING step (forward Pallas kernel + a Pallas backward that re-derives
the VJP of the same in-VMEM math).

The inference kernels (swin_block.py, rdstb_block.py) are gated on
``deterministic`` because ``pallas_call`` has no autodiff rule. This
module closes that gap for the pair kernel with ``jax.custom_vjp``:

* forward: the same composition as `_pair_kernel` (two `_body` blocks
  with the in-VMEM shift relayout), with two training-only deviations —
  exact softmax division instead of the approximate reciprocal (the
  reciprocal primitive has no VJP rule, and fwd/bwd must compute the
  same function), and optional stochastic-depth factors (DropPath,
  nn/layers.py:60) applied to the residual branches in-kernel from
  host-precomputed per-image columns.
* backward: ONE Pallas program per grid step recomputes the pair
  forward in VMEM and runs ``jax.vjp`` of the exact same jax-traceable
  body — flash-attention-style rematerialization: only the block
  input/cotangent/output touch HBM, every intermediate (scores, softmax
  numerators, MLP hiddens) lives and dies in VMEM. Weight/bias gradients
  accumulate in f32 across the sequential TPU grid into revisited
  output blocks.

Parameter folding (LN affines + qk scale into wqkv/w1, see
`_fold_fast_weights`) happens OUTSIDE the custom_vjp boundary in plain
jax, so autodiff chains gradients from the folded space back to the raw
checkpoint parameters for free.

Semantics: bf16 fast path of the inference pair kernel (packed-head
attention, segment-stable softmax, tanh GELU) — the training forward
matches the production inference forward bit-for-bit except for exact
division.
Parity: tests/test_pair_train.py gates x/param grads against jax.grad
of the identical math in XLA (interpret mode).

Reference parity note: the reference trains these blocks through plain
torch autograd (models/swin_transformer_sr.py); a fused training path
has no reference counterpart — it exists because the TPU train step is
HBM-/glue-bound (PERF.md "Training throughput").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rdst_tpu.kernels.swin_block import (
    _body,
    _pair_vmem_estimate,
    _shift_relayout,
    const_spec,
    head_mask_arr,
    pack_bias_fast,
    prep_block_params,
    seg_ones_arr,
    shard_grid_over_data,
    use_fast_path,
)

try:  # TPU-only namespace; interpret mode works everywhere
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# backward holds the vjp residuals of both blocks (scores/exp tensors,
# K/V stacks, MLP hiddens) plus the transposed-matmul temporaries on
# top of the forward working set. Calibrated against the one hardware
# measurement we have: at flagship train geometry (9 windows, C=60,
# nh=6, hidden=120, bf16) Mosaic's bwd stack allocation is 20.6 MiB
# while _pair_vmem_estimate says 3.42 MiB -> factor 6.0 (the old 4.0
# under-predicted by ~30%). Admission gates against
# _TRAIN_VMEM_BUDGET, half the 64 MiB per-kernel compile limit the
# bwd pallas_call requests below, so a mispredicted geometry still has
# 2x headroom before Mosaic rejects the program.
_TRAIN_VMEM_FACTOR = 6.0
_TRAIN_VMEM_BUDGET = 32 * 2**20

_N_BLOCK_PARAMS = 12  # prep_block_params bundle size


def _pair_ops(xf, cdt, nh, t, n, c, nw, geom, fa, ba, fb, bb,
              hmask, segones, dpf):
    """The pair forward on VALUES (f32 in, f32 out) — jax-traceable and
    therefore jax-differentiable. Shared verbatim by the forward kernel
    (called on refs: `_body` only ever slices its operands, which works
    identically on Ref and Array) and by the backward kernel's
    ``jax.vjp``."""
    ipp, nwh, nww, ws, shift = geom
    dpfa = (dpf[:, 0:1], dpf[:, 1:2]) if dpf is not None else None
    dpfb = (dpf[:, 2:3], dpf[:, 3:4]) if dpf is not None else None
    y = _body(xf, cdt, nh, 1.0, t, n, c, True, 1,
              fa[0], fa[1], fa[2], fa[3], fa[4], fa[5], fa[6], fa[7],
              fa[8], fa[9], fa[10], fa[11], ba, hmask, segones,
              exact_recip=True, mm_bias=True, dpf=dpfa)
    y2 = _shift_relayout(y.astype(cdt), ipp, nwh, nww, ws, shift)
    z = _body(y2.astype(jnp.float32), cdt, nh, 1.0, t, n, c, True,
              nw if shift else 1,
              fb[0], fb[1], fb[2], fb[3], fb[4], fb[5], fb[6], fb[7],
              fb[8], fb[9], fb[10], fb[11], bb, hmask, segones,
              exact_recip=True, mm_bias=True, dpf=dpfb)
    return z


def _split_refs(refs, has_dpf):
    p = _N_BLOCK_PARAMS
    fa = tuple(refs[0:p])
    ba = refs[p]
    fb = tuple(refs[p + 1:2 * p + 1])
    bb = refs[2 * p + 1]
    dpf = refs[2 * p + 2] if has_dpf else None
    used = 2 * p + 2 + (1 if has_dpf else 0)
    return fa, ba, fb, bb, dpf, refs[used:]


def _fwd_kernel(nh, t, n, c, nw, geom, has_dpf, x_ref, *refs):
    fa, ba, fb, bb, dpf_ref, rest = _split_refs(refs, has_dpf)
    o_ref = rest[0]
    cdt = x_ref.dtype
    hmask = head_mask_arr(nh, c, cdt)
    segones = seg_ones_arr(nh, n, cdt)
    z = _pair_ops(x_ref[0].astype(jnp.float32), cdt, nh, t, n, c, nw,
                  geom, fa, ba, fb, bb, hmask, segones,
                  dpf_ref[0] if has_dpf else None)
    o_ref[0] = z.astype(o_ref.dtype)


def _bwd_kernel(nh, t, n, c, nw, geom, has_dpf, x_ref, dz_ref, *refs):
    fa_r, ba_r, fb_r, bb_r, dpf_ref, outs = _split_refs(refs, has_dpf)
    cdt = x_ref.dtype
    hmask = head_mask_arr(nh, c, cdt)
    segones = seg_ones_arr(nh, n, cdt)
    # refs -> values: the vjp'd function must be pure in its args
    fa = tuple(r[...] for r in fa_r)
    fb = tuple(r[...] for r in fb_r)
    ba, bb = ba_r[...], bb_r[...]
    dpf = dpf_ref[0] if has_dpf else None

    def f(x, fa, ba, fb, bb):
        return _pair_ops(x, cdt, nh, t, n, c, nw, geom, fa, ba, fb, bb,
                         hmask, segones, dpf)

    _, vjp = jax.vjp(f, x_ref[0].astype(jnp.float32), fa, ba, fb, bb)
    dx, dfa, dba, dfb, dbb = vjp(dz_ref[0].astype(jnp.float32))

    dx_ref = outs[0]
    dx_ref[0] = dx.astype(dx_ref.dtype)
    grads = list(dfa) + [dba] + list(dfb) + [dbb]
    first = pl.program_id(0) == 0
    for o_ref, g in zip(outs[1:], grads):
        gf = g.astype(jnp.float32)

        @pl.when(first)
        def _(o_ref=o_ref, gf=gf):
            o_ref[...] = gf

        @pl.when(jnp.logical_not(first))
        def _(o_ref=o_ref, gf=gf):
            o_ref[...] += gf


@functools.lru_cache(maxsize=None)
def _make_core(nh, t, n, c, hidden, nwb, geom, has_dpf, interpret,
               dt_name):
    """Build (and cache, so jax's tracing caches hold) the custom_vjp
    core for one static pair-kernel configuration. Operates entirely in
    FOLDED parameter space — the caller's fold is plain jax and
    autodiffs through."""
    dt = jnp.dtype(dt_name)
    nw = geom[1] * geom[2]
    vm = {} if (pltpu is None or interpret) else {"memory_space": pltpu.VMEM}

    def const(*shape):
        return const_spec(vm, *shape)

    def shapes_fa():
        return ((c, 3 * c), (1, 3 * c), (c, c), (1, c),
                (1, c), (1, c), (1, c), (1, c),
                (c, hidden), (1, hidden), (hidden, c), (1, c))

    # in_specs shared by fwd and bwd (minus the leading x / dz blocks)
    param_specs = ([const(*s) for s in shapes_fa()]
                   + [const(1, n, nh * n)]
                   + [const(*s) for s in shapes_fa()]
                   + [const(nwb, n, nh * n)])
    if has_dpf:
        param_specs = param_specs + [
            pl.BlockSpec((1, t * n, 4), lambda i: (i, 0, 0), **vm)]
    xblock = pl.BlockSpec((1, t * n, c), lambda i: (i, 0, 0), **vm)

    fwd_kernel = functools.partial(_fwd_kernel, nh, t, n, c, nw, geom,
                                   has_dpf)
    bwd_kernel = functools.partial(_bwd_kernel, nh, t, n, c, nw, geom,
                                   has_dpf)

    def fwd_call(xg, fa, ba, fb, bb, dpf):
        grid = (xg.shape[0],)
        extra = (dpf,) if has_dpf else ()
        return pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[xblock] + param_specs,
            out_specs=xblock,
            out_shape=jax.ShapeDtypeStruct(xg.shape, dt),
            interpret=interpret,
        )(xg, *fa, ba, *fb, bb, *extra)

    def bwd_call(xg, dz, fa, ba, fb, bb, dpf):
        grid = (xg.shape[0],)
        extra = (dpf,) if has_dpf else ()
        f32 = jnp.float32

        def g_out(a):
            return (jax.ShapeDtypeStruct(a.shape, f32),
                    const_spec(vm, *a.shape))

        outs = ([(jax.ShapeDtypeStruct(xg.shape, dt), xblock)]
                + [g_out(a) for a in fa] + [g_out(ba)]
                + [g_out(a) for a in fb] + [g_out(bb)])
        out_shape = tuple(o[0] for o in outs)
        out_specs = tuple(o[1] for o in outs)
        # the bwd program's Mosaic stack overflows the default 16 MiB
        # scoped-VMEM limit at flagship geometry (measured 20.6 MiB);
        # raise the per-kernel limit — v5e has 128 MiB physical VMEM
        # and _TRAIN_VMEM_FACTOR gates admission well below that
        ckw = {}
        if pltpu is not None and not interpret:
            ckw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)
        res = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=[xblock, xblock] + param_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            **ckw,
        )(xg, dz, *fa, ba, *fb, bb, *extra)
        dxg = res[0]
        p = _N_BLOCK_PARAMS
        dfa = tuple(g.astype(a.dtype) for g, a in zip(res[1:p + 1], fa))
        dba = res[p + 1].astype(ba.dtype)
        dfb = tuple(g.astype(a.dtype)
                    for g, a in zip(res[p + 2:2 * p + 2], fb))
        dbb = res[2 * p + 2].astype(bb.dtype)
        return dxg, dfa, dba, dfb, dbb

    if has_dpf:

        @jax.custom_vjp
        def core(xg, fa, ba, fb, bb, dpf):
            return fwd_call(xg, fa, ba, fb, bb, dpf)

        def fwd(xg, fa, ba, fb, bb, dpf):
            return fwd_call(xg, fa, ba, fb, bb, dpf), (
                xg, fa, ba, fb, bb, dpf)

        def bwd(res, dz):
            xg, fa, ba, fb, bb, dpf = res
            dxg, dfa, dba, dfb, dbb = bwd_call(xg, dz, fa, ba, fb, bb, dpf)
            return dxg, dfa, dba, dfb, dbb, jnp.zeros_like(dpf)

    else:

        @jax.custom_vjp
        def core(xg, fa, ba, fb, bb):
            return fwd_call(xg, fa, ba, fb, bb, None)

        def fwd(xg, fa, ba, fb, bb):
            return fwd_call(xg, fa, ba, fb, bb, None), (xg, fa, ba, fb, bb)

        def bwd(res, dz):
            xg, fa, ba, fb, bb = res
            return bwd_call(xg, dz, fa, ba, fb, bb, None)

    core.defvjp(fwd, bwd)
    return core


def fused_pair_train_fits(nw: int, n: int, c: int, nh: int, hidden: int,
                          es: int) -> bool:
    """True when ONE image's pair backward fits the VMEM budget (the
    wrapper can only shrink images_per_program down to 1)."""
    if es != 2 or not use_fast_path(jnp.bfloat16):
        return False
    return (_TRAIN_VMEM_FACTOR * _pair_vmem_estimate(nw, n, c, nh, hidden,
                                                     nw, es)
            <= _TRAIN_VMEM_BUDGET)


def fused_swin_pair_train(x_windows, params_a, bias_a, params_b, bias_b,
                          dp_factors=None, *, num_heads: int, x_size,
                          window_size: int, shift: int,
                          images_per_program: int = 2,
                          interpret: bool = False):
    """Data-parallel shim over `_fused_swin_pair_train_impl` (same
    contract): splits B·nW over the active mesh's data axis at image
    boundaries. shard_map is differentiable — its transpose psums the
    replicated parameters' cotangents over the data axis, which IS the
    DP gradient all-reduce, so the custom-VJP backward composes with
    multi-chip training for free."""
    nw = (x_size[0] // window_size) * (x_size[1] // window_size)
    call = functools.partial(
        _fused_swin_pair_train_impl, num_heads=num_heads,
        x_size=tuple(x_size), window_size=window_size, shift=shift,
        images_per_program=images_per_program, interpret=interpret)

    def body(xs, a):
        x, dpf = xs
        return call(x, a[0], a[1], a[2], a[3], dpf)

    # dp_factors rows are (B·nW·N, 4) batch-major, proportional to
    # x_windows' leading dim — they ride in the SHARDED operand pytree
    # (a replicated spec would hand each device the GLOBAL rows and the
    # impl's local reshape would fail)
    return shard_grid_over_data(
        body, (x_windows, dp_factors),
        (params_a, bias_a, params_b, bias_b), nw)


def _fused_swin_pair_train_impl(x_windows, params_a, bias_a, params_b,
                                bias_b, dp_factors=None, *, num_heads: int,
                                x_size, window_size: int, shift: int,
                                images_per_program: int = 2,
                                interpret: bool = False):
    """Differentiable twin of `fused_swin_pair` (same operand contract:
    unshifted window layout in, SHIFTED window layout out; bf16 fast
    path only; no int8 — training keeps full-precision matmuls).

    dp_factors: optional (B·nW·N, 4) f32 stochastic-depth factor
    columns [attn_a, mlp_a, attn_b, mlp_b], each row in {0, 1/keep},
    constant within an image (DropPath is per-sample). None = identity.
    """
    bnw, n, c = x_windows.shape
    nh = num_heads
    h, w = x_size
    ws = window_size
    nwh, nww = h // ws, w // ws
    nw = nwh * nww
    es = jnp.dtype(x_windows.dtype).itemsize
    assert use_fast_path(x_windows.dtype), "train pair kernel is bf16-only"
    hidden = params_a[8].shape[1]

    ipp = max(1, images_per_program)
    while ipp > 1 and (
            bnw % (nw * ipp) != 0
            or _TRAIN_VMEM_FACTOR * _pair_vmem_estimate(
                nw * ipp, n, c, nh, hidden, nw, es) > _TRAIN_VMEM_BUDGET):
        ipp -= 1
    t = nw * ipp
    dt = x_windows.dtype
    geom = (ipp, nwh, nww, ws, shift)
    nwb = nw if shift else 1

    fa = tuple(prep_block_params(list(params_a), c, nh, dt))
    fb = tuple(prep_block_params(list(params_b), c, nh, dt))
    ba = pack_bias_fast(bias_a, nh, n, dt)
    bb = pack_bias_fast(bias_b, nh, n, dt)

    xg = x_windows.reshape(bnw // t, t * n, c)
    core = _make_core(nh, t, n, c, hidden, nwb, geom,
                      dp_factors is not None, interpret, dt.name)
    if dp_factors is not None:
        dpf = dp_factors.astype(jnp.float32).reshape(bnw // t, t * n, 4)
        out = core(xg, fa, ba, fb, bb, dpf)
    else:
        out = core(xg, fa, ba, fb, bb)
    return out.reshape(bnw, n, c)
