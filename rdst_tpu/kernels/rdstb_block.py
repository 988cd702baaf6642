"""Fused RDSTB mega-kernel (Pallas TPU): one program runs a whole
Residual Dense Swin Transformer Block.

A RDSTB (models/rdst.py, reference swinIR_variations.py:129-220) is
``num_blocks`` DSTLs — each a Swin block pair (shift 0 / ws/2) plus a
tail adapter (Dense C->growth + LN) and a dense channel concat — then a
3x3 conv bottleneck back to embed_dim and a residual. In 'pair' mode
XLA still materializes, per DSTL: the concat, the adapter tensors, and
the partition/reverse copies around each pair, plus HBM round-trips
between pairs and the bottleneck conv's input.

This kernel (RDST_TPU_PALLAS=rdstb) keeps the ENTIRE block in VMEM:

* entry: image-major tokens (ipp·H·W, C) are window-partitioned in VMEM
  (`_image_to_windows`) — no XLA partition copy at all;
* each DSTL runs the two `_body` blocks with the in-VMEM shift relayout
  between them and the inverse relayout after, so every DSTL input is
  back in unshifted window layout for the row-wise adapter + concat;
* dense concats are VMEM copies; adapters are one (C, g) matmul + an
  affine LN over g=30 lanes;
* the bottleneck conv runs as 9 shifted (M, C_cat)·(C_cat, C) matmuls
  over the zero-padded image layout (`_windows_to_image` first), and
  the residual adds the image-major input directly.

Only the (M, C) block input/output touches HBM. Fast path (bf16) only —
weights arrive pre-folded like `fused_swin_pair`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rdst_tpu.kernels.swin_block import (
    _MM_QUANT_SLOTS,
    _VMEM_BUDGET,
    _body,
    _softmax_variant,
    _head_mask,
    _image_to_windows,
    _layernorm,
    _normalize,
    _quant_dyn,
    _seg_ones,
    _shift_relayout,
    _unshift_relayout,
    _vmem_estimate,
    _windows_to_image,
    const_spec,
    mm_quant_extras,
    pack_bias_fast,
    prep_block_params,
    quant_flags,
    quantize_weight,
    shard_grid_over_data,
    unpack_mm_quant,
    use_fast_path,
)

try:  # TPU-only namespace; interpret mode works everywhere
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# refs per DSTL: 2 blocks x (wqkv bqkv wproj bproj w1 bf1 w2 bf2)
# + bias_a + bias_b + adapter (wa ba ga bba) + hmask + segones
# + optional per-block int8 operands (swin_block._MM_QUANT_SLOTS order)
_PER_BLOCK = 8
_PER_DSTL = 2 * _PER_BLOCK + 2 + 4 + 2


def _quant_extras_per_block(quant) -> int:
    return sum(_MM_QUANT_SLOTS[g] for g in ("qkv", "mlp", "proj")
               if g in quant)


def _conv3x3(img, wc_ref, bc_ref, cin, cout, dequant=None):
    """SAME zero-padded 3x3 conv as 9 shifted matmuls, in VMEM.

    img: (ipp, H, W, Cin) value (f32, or int8 when ``dequant`` is given
    — the taps then accumulate int32 and dequantize ONCE at the end);
    wc: (9·Cin, Cout) tap-major rows (dy, dx, cin); bc: (1, Cout);
    dequant: f32 (1, Cout) per-channel weight scale times the dynamic
    activation step."""
    ipp, h, w, _ = img.shape
    m = ipp * h * w
    acc_t = jnp.int32 if dequant is not None else jnp.float32
    acc = jnp.zeros((m, cout), acc_t)
    zrow = jnp.zeros((ipp, 1, w, cin), img.dtype)
    zcol = jnp.zeros((ipp, h, 1, cin), img.dtype)
    for dy in (-1, 0, 1):
        if dy == -1:  # output row y reads input row y-1
            sh = jnp.concatenate([zrow, img[:, :-1]], axis=1)
        elif dy == 1:
            sh = jnp.concatenate([img[:, 1:], zrow], axis=1)
        else:
            sh = img
        for dx in (-1, 0, 1):
            if dx == -1:
                sv = jnp.concatenate([zcol, sh[:, :, :-1]], axis=2)
            elif dx == 1:
                sv = jnp.concatenate([sh[:, :, 1:], zcol], axis=2)
            else:
                sv = sh
            tap = (dy + 1) * 3 + (dx + 1)
            acc = acc + jnp.dot(
                sv.reshape(m, cin),
                wc_ref[tap * cin:(tap + 1) * cin, :],
                preferred_element_type=acc_t)
    if dequant is not None:
        acc = acc.astype(jnp.float32) * dequant
    return acc + bc_ref[...].astype(jnp.float32)


def _rdstb_kernel(geom, c0, growth, nh, nb, prenorm, quant, x_ref, *refs):
    """geom = (ipp, nwh, nww, ws, shift). refs laid out per _PER_DSTL
    (+ per-block int8 extras when quant is non-empty), then conv
    kernel/bias (+ conv dequant scales); the output ref is last."""
    ipp, nwh, nww, ws, shift = geom
    nw = nwh * nww
    n = ws * ws
    t = ipp * nw
    o_ref = refs[-1]
    refs = refs[:-1]
    cdt = x_ref.dtype
    per_dstl = _PER_DSTL + 2 * _quant_extras_per_block(quant)

    x0 = x_ref[0]  # (ipp·H·W, C0) image-major tokens
    xw = _image_to_windows(
        x0.reshape(ipp, nwh * ws, nww * ws, c0), ipp, nwh, nww, ws)

    feats = [xw]  # dense features, window layout, cdt
    c = c0
    for d in range(nb):
        base = d * per_dstl
        (wqkv_a, bqkv_a, wproj_a, bproj_a, w1_a, bf1_a, w2_a, bf2_a,
         wqkv_b, bqkv_b, wproj_b, bproj_b, w1_b, bf1_b, w2_b, bf2_b,
         bias_a, bias_b, wad, bad, gad, bbad, hmask, segones) = refs[
            base:base + _PER_DSTL]
        qa, qoff = unpack_mm_quant(refs, base + _PER_DSTL, quant)
        qb, _ = unpack_mm_quant(refs, qoff, quant)

        xin = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)
        scale = (c // nh) ** -0.5
        y = _body(xin.astype(jnp.float32), cdt, nh, scale, t, n, c, True, 1,
                  wqkv_a, bqkv_a, wproj_a, bproj_a,
                  bqkv_a, bqkv_a, bqkv_a, bqkv_a,  # LN affines pre-folded
                  w1_a, bf1_a, w2_a, bf2_a, bias_a, hmask, segones,
                  quant=qa)
        if shift:
            y = _shift_relayout(y.astype(cdt), ipp, nwh, nww, ws, shift)
        else:
            y = y.astype(cdt)
        y = _body(y.astype(jnp.float32), cdt, nh, scale, t, n, c, True,
                  nw if shift else 1,
                  wqkv_b, bqkv_b, wproj_b, bproj_b,
                  bqkv_b, bqkv_b, bqkv_b, bqkv_b,
                  w1_b, bf1_b, w2_b, bf2_b, bias_b, hmask, segones,
                  quant=qb)
        if shift:
            y = _unshift_relayout(y.astype(cdt), ipp, nwh, nww, ws, shift)
        else:
            y = y.astype(cdt)
        if prenorm:
            # LN(C) -> Dense: the LN affine arrives pre-folded into
            # wad/bad (see fused_rdstb.prep_adapter) — normalize-only
            yn = _normalize(y.astype(jnp.float32)).astype(cdt)
            a = jnp.dot(yn, wad[...], preferred_element_type=jnp.float32)
            a = a + bad[...].astype(jnp.float32)
        else:
            # Dense(C -> growth) then LN (post-norm), row-wise
            a = jnp.dot(y, wad[...], preferred_element_type=jnp.float32)
            a = a + bad[...].astype(jnp.float32)
            a = _layernorm(a, gad[...].astype(jnp.float32),
                           bbad[...].astype(jnp.float32))
        feats.append(a.astype(cdt))
        c += growth

    conv_refs = refs[nb * per_dstl:]
    cat = jnp.concatenate(feats, axis=-1)  # (T·N, C0 + nb·g)
    if "conv" in quant:
        wcq_ref, wcs_ref, bc_ref = conv_refs[:3]
        catq, cdq = _quant_dyn(cat.astype(jnp.float32))
        img = _windows_to_image(catq, ipp, nwh, nww, ws)  # int8 tap copies
        out = _conv3x3(img, wcq_ref, bc_ref, c, c0,
                       dequant=wcs_ref[...] * cdq)
    else:
        wc_ref, bc_ref = conv_refs[:2]
        img = _windows_to_image(cat, ipp, nwh, nww, ws)
        out = _conv3x3(img, wc_ref, bc_ref, c, c0)
    o_ref[0] = (out + x0.astype(jnp.float32)).astype(o_ref.dtype)


def _rdstb_vmem_estimate(t, n, c0, growth, nb, nh, hidden_ratio, es,
                         nw=None) -> float:
    """Peak ~ the widest DSTL's single-block estimate + everything that
    is simultaneously VMEM-resident around it: the SECOND weight set of
    every DSTL, every DSTL's shifted bias stack, the live dense
    features, relayout temporaries at the widest width, the concat /
    conv-image buffers and the conv weights + shifted tap copies. Err
    on the high side — an optimistic gate dies in Mosaic instead of
    falling back to XLA."""
    def pad(v):
        return -(-v // 128) * 128

    nw = t if nw is None else nw
    cmax = c0 + growth * (nb - 1)
    ccat = c0 + growth * nb
    widest = _vmem_estimate(t, n, cmax, nh, int(cmax * hidden_ratio),
                            nw, es, fast=True)
    feats = t * n * (pad(c0) + nb * pad(growth)) * es
    relayout = 3 * t * n * pad(cmax) * es
    cat = 2 * t * n * pad(ccat) * es  # concat + conv img relayout
    conv_shift = 2 * t * n * pad(ccat) * es  # _conv3x3 sh/sv copies
    conv_acc = t * n * pad(c0) * 4
    conv_w = 9 * ccat * pad(c0) * es
    biases = (nb - 1) * nw * n * pad(nh * n) * es  # widest's own is counted
    weights2 = 2 * sum(
        (3 * ci * pad(ci) + ci * pad(ci)
         + 2 * ci * pad(int(ci * hidden_ratio))) * es
        for ci in (c0 + growth * i for i in range(nb)))
    # Calibration anchor: RDST-E1 at ipp=2 (t=40; widest alone models
    # 13.5 MB, raw extras 13.8 MB) RUNS on hardware, so Mosaic reuses
    # almost all of the extra buffers across the DSTL sequence — the
    # live-range factor below keeps that measured config admitted while
    # still growing with every term for larger geometries.
    return widest + 0.12 * (weights2 + feats + relayout + cat
                            + conv_shift + conv_acc + conv_w + biases)


def fused_rdstb_fits(nw: int, n: int, c0: int, growth: int, nb: int,
                     nh: int, hidden_ratio: float, es: int) -> bool:
    if es != 2 or not use_fast_path(jnp.bfloat16):
        return False
    return _rdstb_vmem_estimate(nw, n, c0, growth, nb, nh, hidden_ratio,
                                es, nw=nw) <= _VMEM_BUDGET


_PROBE_CACHE: dict = {}


def probe_args(x_size, ws, shift, c0, growth, nb, nh, hidden_ratio,
               prenorm, ipp):
    """Dummy (x, dstls, conv_kernel, conv_bias) with the exact shapes
    the model layer feeds fused_rdstb — the probe compiles with these,
    so a shape drift here would silently disable the mega-kernel on
    hardware (regression-tested in interpret mode)."""
    h, w = x_size
    n = ws * ws
    nw = (h // ws) * (w // ws)
    dt = jnp.bfloat16
    f32 = jnp.float32

    def blk(c):
        hid = int(c * hidden_ratio)
        return (jnp.zeros((c, 3 * c), dt), jnp.zeros((3 * c,), dt),
                jnp.zeros((c, c), dt), jnp.zeros((c,), dt),
                jnp.ones((c,), f32), jnp.zeros((c,), f32),
                jnp.ones((c,), f32), jnp.zeros((c,), f32),
                jnp.zeros((c, hid), dt), jnp.zeros((hid,), dt),
                jnp.zeros((hid, c), dt), jnp.zeros((c,), dt))

    dstls = []
    c = c0
    for _ in range(nb):
        bias_a = jnp.zeros((nh, n, n), dt)
        bias_b = jnp.zeros((nh * (nw if shift else 1), n, n), dt)
        # prenorm: LN(C) precedes the Dense, so its affine is C-sized;
        # postnorm: LN(growth) follows it (matches DenseSTLayer)
        ca = c if prenorm else growth
        adapter = (jnp.zeros((c, growth), dt), jnp.zeros((growth,), dt),
                   jnp.ones((ca,), f32), jnp.zeros((ca,), f32))
        dstls.append({"blocks": [(blk(c), bias_a), (blk(c), bias_b)],
                      "adapter": adapter})
        c += growth
    ck = jnp.zeros((3, 3, c, c0), dt)
    cb = jnp.zeros((c0,), f32)
    x = jnp.zeros((ipp, h * w, c0), dt)
    return x, dstls, ck, cb


def fused_rdstb_probe(x_size, ws: int, shift: int, c0: int, growth: int,
                      nb: int, nh: int, hidden_ratio: float, prenorm: bool,
                      ipp: int = 1, quant: frozenset = None) -> bool:
    """Mosaic-compile the mega-kernel ONCE per geometry with dummy
    weights (``.lower().compile()``, no execution). The VMEM gate's
    live-range factor is calibrated on one measured geometry, so an
    optimistic admit on a new config would otherwise die inside Mosaic
    mid-model with no fallback; this makes such geometries fall back to
    the pair/XLA path instead (ADVICE r2). Cached per geometry, active
    quant flag set AND softmax variant (the compiled program depends
    on all three).

    Caveat (axon dev tunnel only): the tunnel defers the real AOT
    compile past ``.compile()``, so the probe can false-positive there
    (seen in the r4 ipp sweep: rdstb:2 probed OK then hit a 17.07M
    Mosaic stack OOM in the full-model compile). The VMEM estimate's
    stable-softmax term now rejects that geometry up front; on a pod
    runtime ``.compile()`` is synchronous and the probe is sound."""
    if quant is None:
        quant = quant_flags()
    # the softmax variant is part of the compiled program (the stable
    # default keeps an extra scores buffer live), so a probe admit from
    # one variant must not be reused under another
    key = (tuple(x_size), ws, shift, c0, growth, nb, nh, hidden_ratio,
           prenorm, ipp, quant, _softmax_variant())
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    x, dstls, ck, cb = probe_args(x_size, ws, shift, c0, growth, nb, nh,
                                  hidden_ratio, prenorm, ipp)
    try:
        # probe the jitted IMPL: the public fused_rdstb is a plain-
        # function DP shim (no .lower), and the probe must exercise the
        # single-device Mosaic compile regardless of any active mesh
        _fused_rdstb_impl.lower(
            x, dstls, ck, cb, num_heads=nh, x_size=tuple(x_size),
            window_size=ws, shift=shift, growth=growth,
            adapter_prenorm=prenorm, images_per_program=ipp,
            quant=quant).compile()
        _PROBE_CACHE[key] = True
    except Exception as e:  # Mosaic/VMEM compile failure -> fall back
        import warnings

        warnings.warn(
            f"fused_rdstb probe-compile failed for geometry {key}; "
            f"falling back to the pair/XLA path ({type(e).__name__}: {e})")
        _PROBE_CACHE[key] = False
    return _PROBE_CACHE[key]


def fused_rdstb(x_tokens, dstls, conv_kernel, conv_bias, *,
                num_heads: int, x_size, window_size: int, shift: int,
                growth: int, adapter_prenorm: bool = False,
                images_per_program: int = 1, interpret: bool = False,
                quant: frozenset = None):
    """Data-parallel shim over `_fused_rdstb_impl` (same contract):
    splits the image batch over the active mesh's data axis so each
    device runs only its own grid steps (see
    swin_block.shard_grid_over_data)."""
    # env gate resolved unjitted -> part of the jit cache key (see
    # swin_block.fused_swin_block); rdstb also supports the conv group
    if quant is None:
        quant = quant_flags()
    call = functools.partial(
        _fused_rdstb_impl, num_heads=num_heads, x_size=tuple(x_size),
        window_size=window_size, shift=shift, growth=growth,
        adapter_prenorm=adapter_prenorm,
        images_per_program=images_per_program, interpret=interpret,
        quant=quant)
    return shard_grid_over_data(
        lambda x, a: call(x, *a), x_tokens,
        (dstls, conv_kernel, conv_bias), 1)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "x_size", "window_size", "shift",
                     "growth", "adapter_prenorm", "images_per_program",
                     "interpret", "quant"))
def _fused_rdstb_impl(x_tokens, dstls, conv_kernel, conv_bias, *,
                      num_heads: int, x_size, window_size: int, shift: int,
                      growth: int, adapter_prenorm: bool = False,
                      images_per_program: int = 1, interpret: bool = False,
                      quant: frozenset = None):
    """One whole RDSTB per Pallas program.

    x_tokens: (B, H·W, C0) image-major tokens (the RDSTB boundary
    layout — no XLA window partition anywhere).
    dstls: per DSTL a dict with
        'blocks': [(params12, bias), (params12, bias)]  (SwinTransformer
                  block bundles, block 0 unshifted / block 1 shifted),
        'adapter': (wa, ba, gamma, beta) — Dense(C->growth) + LN
                  (post-norm), or with adapter_prenorm=True the LN(C)
                  affine + Dense (the affine folds into the Dense).
    conv_kernel: (3, 3, C_cat, C0) HWIO; conv_bias: (C0,).
    Returns (B, H·W, C0). bf16 fast path only.

    images_per_program defaults to 1: measured FASTER than 2 for this
    kernel (2887 vs 2699 slices/s at RDST-E1 shapes — the C_cat=150
    working set at t=40 strains VMEM and pipelines worse), unlike the
    single-block/pair kernels where 2 wins.
    """
    b, l, c0 = x_tokens.shape
    h, w = x_size
    ws = window_size
    nwh, nww = h // ws, w // ws
    nw = nwh * nww
    n = ws * ws
    nh = num_heads
    nb = len(dstls)
    dt = x_tokens.dtype
    es = jnp.dtype(dt).itemsize
    assert use_fast_path(dt), "fused_rdstb is fast-path (bf16) only"
    if quant is None:
        quant = quant_flags()  # trace-time env read (like use_fast_path)

    hidden0 = dstls[0]["blocks"][0][0][8].shape[1]
    hidden_ratio = hidden0 / c0
    ipp = max(1, images_per_program)
    while ipp > 1 and (b % ipp != 0 or _rdstb_vmem_estimate(
            nw * ipp, n, c0, growth, nb, nh, hidden_ratio,
            es, nw=nw) > _VMEM_BUDGET):
        ipp -= 1
    t = nw * ipp
    grid = (b // ipp,)

    def prep(params, c):
        full = prep_block_params(params, c, nh, dt)
        # slots 4..7 are the LN affine rows — folded away on this path
        return full[:4] + full[8:]

    def pack_bias(bias):
        return pack_bias_fast(bias, nh, n, dt)

    vm = {} if (pltpu is None or interpret) else {"memory_space": pltpu.VMEM}

    def const(*shape):
        return const_spec(vm, *shape)

    operands, specs = [], []

    def add(arr):
        operands.append(arr)
        specs.append(const(*arr.shape))

    def add_quant_extras(folded):
        # folded (LN rows dropped by prep): [wqkv, bqkv, wproj, bproj,
        # w1, bf1, w2, bf2] — shared group order via mm_quant_extras
        for arr in mm_quant_extras(folded[0], folded[4], folded[6],
                                   folded[2], quant):
            add(arr)

    dead = jnp.zeros((8, 128), dt)  # minimal-tile stand-in: a bf16
    # weight superseded by its int8 twin is never read by the kernel,
    # so don't spend VMEM shipping it

    def drop_quantized(folded):
        f = list(folded)
        if "qkv" in quant:
            f[0] = dead
        if "mlp" in quant:
            f[4] = dead
            f[6] = dead
        if "proj" in quant:
            f[2] = dead
        return f

    c = c0
    for d in dstls:
        (pa, bias_a), (pb, bias_b) = d["blocks"]
        fa, fb = prep(pa, c), prep(pb, c)
        for arr in drop_quantized(fa) + drop_quantized(fb):
            add(arr)
        add(pack_bias(bias_a))
        add(pack_bias(bias_b))
        wa, ba, ga, bba = d["adapter"]
        if adapter_prenorm:
            # fold the pre-LN affine into the Dense: (x̂·γ+β)W + b =
            # x̂·(γ⊙W) + (βW + b); folded bias stays f32
            f32 = jnp.float32
            wa_f = ga.astype(f32)[:, None] * wa.astype(dt).astype(f32)
            ba_f = bba.astype(f32) @ wa.astype(dt).astype(f32) \
                + ba.astype(dt).astype(f32)
            add(wa_f.astype(dt))
            add(ba_f.reshape(1, growth))
            add(ba_f.reshape(1, growth))  # unused slots (uniform layout)
            add(ba_f.reshape(1, growth))
        else:
            add(wa.astype(dt))
            add(ba.astype(dt).reshape(1, growth))
            add(ga.astype(jnp.float32).reshape(1, growth))
            add(bba.astype(jnp.float32).reshape(1, growth))
        add(_head_mask(nh, c, dt))
        add(_seg_ones(nh, n, dt))
        add_quant_extras(fa)
        add_quant_extras(fb)
        c += growth

    # conv kernel -> tap-major (9·C_cat, C0) rows (dy, dx, cin)
    ccat = conv_kernel.shape[2]
    wc = conv_kernel.astype(dt).reshape(9 * ccat, c0)
    if "conv" in quant:
        for arr in quantize_weight(wc, act_step=1.0):
            add(arr)
    else:
        add(wc)
    add(conv_bias.astype(jnp.float32).reshape(1, c0))

    geom = (ipp, nwh, nww, ws, shift)
    kernel = functools.partial(_rdstb_kernel, geom, c0, growth, nh, nb,
                               adapter_prenorm, quant)
    xg = x_tokens.reshape(b // ipp, ipp * l, c0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, ipp * l, c0), lambda i: (i, 0, 0), **vm)]
        + specs,
        out_specs=pl.BlockSpec((1, ipp * l, c0), lambda i: (i, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct(xg.shape, dt),
        interpret=interpret,
    )(xg, *operands)
    return out.reshape(b, l, c0)


# see swin_block.py: trace-cache clearing via the public shim name
fused_rdstb.clear_cache = _fused_rdstb_impl.clear_cache
