"""Fused Swin transformer block (Pallas TPU).

Round-1 measurement showed RDST-E1 inference is HBM-bound: the XLA
graph materializes ~1.3 GB/slice of intermediates, ~10% of it the
(B·nW, nH, 64, 64) attention scores and most of the rest LN/qkv/MLP
outputs and layout copies (48 Swin blocks/forward, SURVEY §3.3; hot
loop /root/reference/networks/swin_transformer_sr.py:62-141,160-274).
Fusing only the attention core (see window_attention.py) LOST to XLA
because per-head head_dim=10..20 matmuls underfill the MXU.

This kernel fuses the ENTIRE block body instead —

    LN1 -> qkv -> W-MSA (rel-pos bias + shift mask) -> proj
        -> +residual -> LN2 -> MLP(GELU) -> +residual

— so per block only the (T·N, C) input is read and the (T·N, C)
output written; every intermediate lives in VMEM.

Design points (each measured on the v5e-lite chip):

* **Window layout I/O.** LayerNorm / MLP / residuals are row-wise, so
  they commute with token permutations. The caller keeps tokens in
  window-partition order ((B·nW, N=ws², C)) and the kernel never
  reshuffles spatial data; XLA does roll/partition/reverse between
  blocks (cheap fused copies). The only in-kernel reshapes merge or
  split *leading* dims (sublane-aligned no-ops for Mosaic).
* **Packed attention (fast path, bf16).** Per-head (N, hd)·(hd, N)
  matmuls with hd = C/nH = 10..20 run at <10% MXU fill, and Mosaic
  unrolls batched dot_generals, so issue count dominates. Instead the
  keys/values are channel-masked per head and stacked along the
  sublane dim (K''[t, h·N+j, c] = k[t,j,c]·m_h[c]); one batched
  matmul q @ K''ᵀ yields ALL heads' scores (T, N, nH·N) at full lane
  width (zeros kill cross-head terms). Softmax denominators come from
  a thin seg-sum matmul E @ S (S[h·N+j, h'] = δ_hh'), broadcast back
  through the head-mask matmul, and the divide folds in AFTER the
  attention·V product — one full-lane exp pass, no max-subtract
  reduce (scores are clamped at 60; trained scores are O(10)), and an
  approximate reciprocal. Measured 9.9/12.0/12.0 -> 7.6/6.9/6.8
  µs/slice at C=60/90/120.
* **Precise path (f32).** Per-head masked full-C contractions with
  max-subtracted softmax, exact division and polynomial-erf GELU
  (Mosaic has no erf/erfc): bit-faithful to the reference math for
  parity tests and f32 inference.

Grid: one program per `images_per_program` images (T = ipp·nW
windows), or — when a whole image overflows VMEM — per window chunk
t | nW with per-chunk bias slices routed through a modular BlockSpec
index map. Weights/bias use constant index maps so Mosaic fetches them
once, amortized over the batch. Matmuls accumulate f32
(preferred_element_type); LN computes in f32 in both paths.

Variants on top of the single-block kernel (all parity-gated in
tests/test_kernels.py, selected via RDST_TPU_PALLAS):

* **'pair'** — `fused_swin_pair` runs a whole DSTL (shift-0 block +
  shifted block) per program with the inter-block window_reverse ->
  roll -> partition done in VMEM (`_shift_relayout`), saving one HBM
  round-trip + one XLA relayout copy per DSTL.
* **'pack'** — at C <= 64, two windows share each lane row: the pair
  becomes 2nH virtual heads over 2C channels with block-diagonal
  weights (the head-packing machinery is reused verbatim) and
  segment-LN, doubling VPU lane fill and K=C MXU depth.
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

_EPS = 1e-5  # torch-default LayerNorm epsilon (nn/layers.py)
_CLAMP = 60.0  # clamp variant (RDST_TPU_PALLAS_SOFTMAX=clamp, or 'auto'
#                when the checkpoint's audited logit bound clears the margin)

# 'auto' picks clamp only when the checkpoint's stamped attn_logit_max
# clears this margin — 20 below the 60 clamp, absorbing input variation
# beyond the audited validation set and (during training) logit growth
# between quick-eva probes (the r4 100k run grew 25 -> 227 over 100k
# steps, ~0.002/step; probes run every check_every=2500 steps).
AUTO_CLAMP_MARGIN = 40.0


def _softmax_variant() -> str:
    """Fast-path softmax stabilizer, read at TRACE time.

    '' / 'stable' (default): segment-stable — per-head row-max
    subtract, exact softmax invariance at any logit magnitude.
    'clamp': the r1-r3 clamp-only variant (no stabilizer pass, scores
    clamped at 60). It is faster by roughly one lane-reduce per block
    but silently flattens attention once trained logits exceed the
    clamp — the r4 100k-schedule run reached max 227 (40k recipe: 25)
    and went NaN on hardware. Keep it only for models whose logits are
    verified bounded.
    'auto': resolved to clamp/stable by the weight-loading layer
    (checkpoint.loading.resolve_pallas_softmax) against the audited
    attn_logit_max stamp in the snapshot's stats sidecar, BEFORE the
    first trace. If it reaches a trace unresolved (no loader in the
    path), fail safe to stable."""
    v = os.environ.get("RDST_TPU_PALLAS_SOFTMAX", "")
    return "" if v == "auto" else v


def resolve_softmax_auto(attn_logit_max) -> str:
    """pallas_softmax='auto' policy: clamp is sound only for checkpoints
    whose audited max attention logit clears the safety margin; an
    unstamped checkpoint gets an exact stable softmax (the reference
    bar is exact softmax at any magnitude,
    /root/reference/networks/swin_transformer_sr.py:120-134).

    The escalation target is 'stable_bc' — identical exact-softmax
    numerics to 'stable' (both subtract the true per-head row max;
    gated together in test_large_logit_stability) but measured faster
    on chip: 2770 vs 2719 slices/s at the flagship geometry (r5,
    queue step bench_stable_bc) — one full-lane exp over broadcast
    per-head maxes instead of the per-head exp/concat loop."""
    if attn_logit_max is None:
        return "stable_bc"
    return ("clamp" if float(attn_logit_max) < AUTO_CLAMP_MARGIN
            else "stable_bc")

# int8 quantization (RDST_TPU_PALLAS_QUANT): static activation scale for
# post-LayerNorm inputs — normalize() output is unit-variance by
# construction, so ±4σ covers ~99.99% of values and clip loss is noise
_QCLIP = 4.0
_QX = 127.0 / _QCLIP

_VMEM_BUDGET = 15.5 * 2**20  # scoped-VMEM limit is 16 MiB on v5e-class cores


def _vmem_estimate(t, n, c, nh, hidden, nw, es, fast=False) -> float:
    """Peak-VMEM model for _block_kernel, used to clamp
    images_per_program before the Mosaic stack allocator OOMs.

    VMEM buffers pad the lane (last) dim to 128, so c=60 costs as much
    as c=128. Calibrated against measured Mosaic stack allocations on a
    v5e-lite core (precise path: 16.38 MB OOM at T=40/C=120/f32-bias,
    19.57 MB OOM at T=80/C=60; fast path: T=40/C=120 fits)."""
    def pad(v):
        return -(-v // 128) * 128

    tn = t * n
    weights = (3 * c * pad(c) + c * pad(c) + c * pad(hidden)
               + hidden * pad(c)) * es
    if fast:
        act = tn * (pad(c) * (22 + 3 * es)
                    + pad(nh * n) * (4 + es)
                    + pad(hidden) * (4 + es)
                    + pad(nh) * 4)
        if _softmax_variant() != "clamp":
            # segment-stable softmax (r4 default) keeps one extra
            # scores-sized buffer live (per-head exp segments + their
            # lane concat). Measured: E1 mega-kernel at ipp=2 went from
            # fitting (clamp era) to a 17.07M Mosaic stack OOM against
            # the 16M scoped limit — this term flips the gate to
            # reject it (ipp=1, 2721.6 slices/s, still admitted).
            act += tn * pad(nh * n) * es
        stacks = 2 * t * nh * n * pad(c) * es  # K''/V''
        bias = nw * n * pad(nh * n) * es
        return 0.48 * (act + stacks + weights + bias)
    act = tn * (pad(c) * (16 + 5 * es) + pad(n) * 12 + pad(hidden) * (4 + es))
    bias = nh * nw * n * pad(n) * es
    return 0.8 * (act + weights + bias)


def _erf(x):
    """Abramowitz–Stegun 7.1.26 erf (max abs err 1.5e-7): Mosaic has no
    erf/erfc primitive, but exp lowers fine."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _layernorm(xf, gamma, beta):
    """Row-wise LayerNorm in f32. xf: (..., C); gamma/beta: (1, C)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + _EPS)
    return xn * gamma + beta


def _normalize(xf, nseg: int = 1):
    """Affine-free LayerNorm (fast path): the gamma/beta affine is folded
    into the downstream weight matrix at trace time (LN feeds only a
    Linear here, and (x̂·γ+β)W = x̂·(γ⊙W) + βW), saving one full-width
    VPU pass per LN.

    Uses the one-shot moments form E[x²]−E[x]²: two reduce passes + a
    single FMA output pass, instead of reduce/subtract/reduce/scale.
    Cancellation is a non-issue here: post-residual activations are
    O(1)-centered and the accumulation is f32 (the precise path keeps
    the two-pass centered form).

    nseg > 1 = segment-LN for the window-packed layout: the lane dim
    holds nseg windows' channels side by side and each window normalizes
    over its own C = lanes/nseg segment. Moments come from one thin
    (2C, nseg) one-hot matmul; the broadcast back rides the same matrix
    transposed."""
    if nseg == 1:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        ex2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(ex2 - mu * mu, 0.0)
        a = jax.lax.rsqrt(var + _EPS)
        return xf * a - mu * a
    ctot = xf.shape[-1]
    cs = ctot // nseg
    ch = jax.lax.broadcasted_iota(jnp.int32, (ctot, nseg), 0)
    sg = jax.lax.broadcasted_iota(jnp.int32, (ctot, nseg), 1)
    seg = (ch // cs == sg).astype(jnp.float32)  # (ctot, nseg) one-hot
    mu = jnp.dot(xf, seg, preferred_element_type=jnp.float32) / cs
    ex2 = jnp.dot(xf * xf, seg, preferred_element_type=jnp.float32) / cs
    var = jnp.maximum(ex2 - mu * mu, 0.0)
    a = jax.lax.rsqrt(var + _EPS)  # (M, nseg)
    ab = jnp.dot(a, seg.T, preferred_element_type=jnp.float32)
    mab = jnp.dot(mu * a, seg.T, preferred_element_type=jnp.float32)
    return xf * ab - mab


def _bias_add(y, b, mm):
    """(R, k) + (1, k). mm=True (training kernels only) materializes
    the row broadcast as an MXU ones-column outer product instead of a
    ``vector.broadcast``: the pair-train BACKWARD program is large
    enough that Mosaic packs several (1, k) bias vectors into shared
    tiles at nonzero lane offsets and then rejects the broadcast with
    'Invalid input layout' (hardware-measured at the flagship train
    geometry: (1x120)->(576x120), lane offset 240 — r3, PERF.md). The
    f32 ones-matmul is exact and its VJP (a column-sum) is the same
    cotangent the broadcast-add produces, so grad parity is unchanged."""
    b = b.astype(jnp.float32)
    if not mm:
        return y + b
    ones = jnp.ones((y.shape[0], 1), jnp.float32)
    return y + jax.lax.dot_general(
        ones, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _quant_rows(xf, s):
    """f32 -> int8 rows at static scale s (one round/clip pass)."""
    return jnp.clip(jnp.round(xf * s), -127.0, 127.0).astype(jnp.int8)


def _quant_dyn(xf):
    """Dynamic per-tensor int8: returns (int8 rows, dequant scalar)."""
    amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-30)
    s = 127.0 / amax
    return _quant_rows(xf, s), amax * (1.0 / 127.0)


def _body(xf, cdt, nH, scale, T, N, C, fast, bw,
          wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
          g1_ref, b1_ref, g2_ref, b2_ref,
          w1_ref, bf1_ref, w2_ref, bf2_ref,
          bias_ref, hmask_ref, segones_ref, nseg=1, quant=None,
          exact_recip=False, mm_bias=False, dpf=None):
    """One Swin block body on an in-VMEM (T·N, C) f32 value; returns the
    f32 output. Shared by the single-block and DSTL-pair kernels.

    bw = windows covered by the bias block, tiling period over T: the
    whole image's nW when the bias varies per window (shifted block with
    mask — T spans ipp whole images), the chunk size t when the grid is
    window-chunked (T = bw = t, one bias slice per chunk), or 1 when all
    windows share it (unshifted: rel-pos only — nW× smaller VMEM).

    quant (fast path only): optional dict of int8 matmul operands —
    'qkv': (wq_ref int8 (C,3C), ws_ref f32 (1,3C) pre-multiplied by the
    static activation step), 'mlp': (w1q, w1s, w2q, w2s), 'proj':
    (wpq, wps). fc1/qkv inputs are post-normalize (unit variance:
    static ±4σ scale); fc2/proj inputs use a dynamic per-tensor scale.
    v5e MXU int8 throughput is 2x bf16 — this trades output agreement
    for MXU cycles; quality is measured in PERF.md, default off.

    exact_recip: use exact division for the softmax normalizer instead
    of the approximate reciprocal — the training path (pair_train.py)
    needs a jax-differentiable body, and pl.reciprocal has no VJP rule.
    mm_bias: lower row-broadcast bias adds as an MXU ones-column
    matmul (_bias_add's mm flag) — only the pair-train BACKWARD needs
    this Mosaic-layout workaround; independent of exact_recip so an
    inference caller can ask for exact division without also switching
    bias lowering.
    dpf: optional (attn, mlp) stochastic-depth factor columns, each
    (T·N, 1) f32 in {0, 1/keep} (DropPath semantics, nn/layers.py:60),
    applied to the residual branches. Training path only."""
    quant = quant or {}
    if fast:
        # LN affine and the qk scale are pre-folded into wqkv/bqkv
        # (see fused_swin_block): normalize-only LN, no q·scale pass
        xn_f = _normalize(xf, nseg)
        xn = None if "qkv" in quant else xn_f.astype(cdt)
    else:
        g1 = g1_ref[...].astype(jnp.float32)
        b1 = b1_ref[...].astype(jnp.float32)
        xn = _layernorm(xf, g1, b1).astype(cdt)

    # three separate projections (instead of one (T·N, 3C) f32 dot) to
    # bound peak VMEM when T spans several images
    if "qkv" in quant:
        wq_ref, ws_ref = quant["qkv"]
        xq = _quant_rows(xn_f, _QX)

        def proj(lo):
            y = jnp.dot(xq, wq_ref[:, lo:lo + C],
                        preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * ws_ref[0, lo:lo + C][None]
                    + bqkv_ref[0, lo:lo + C][None].astype(jnp.float32))
    else:
        def proj(lo):
            y = jnp.dot(xn, wqkv_ref[:, lo:lo + C],
                        preferred_element_type=jnp.float32)
            return _bias_add(y, bqkv_ref[0, lo:lo + C][None], mm_bias)

    q = proj(0) if fast else proj(0) * scale
    q = q.astype(cdt).reshape(T, N, C)
    k = proj(C).astype(cdt).reshape(T, N, C)
    v = proj(2 * C).astype(cdt).reshape(T, N, C)

    if fast:
        # packed attention: all heads in one batched matmul per stage.
        # K''/V'': channel-masked per head, stacked on the sublane dim.
        # (A broadcast-multiply + reshape formulation of this stack
        # crashes Mosaic at E1 shapes — r3 negative result, PERF.md.)
        hm = [hmask_ref[h:h + 1][None].astype(cdt) for h in range(nH)]
        kst = jnp.concatenate([k * m for m in hm], axis=1)  # (T, nH*N, C)
        vst = jnp.concatenate([v * m for m in hm], axis=1)
        s = jax.lax.dot_general(
            q, kst, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (T, N, nH*N)
        if bw == 1:
            s = s + bias_ref[0].astype(jnp.float32)[None]
        else:
            s = (s.reshape(T // bw, bw, N, nH * N)
                 + bias_ref[...].astype(jnp.float32)[None]).reshape(T, N, nH * N)
        if _softmax_variant() == "clamp":
            # legacy fast path: no stabilizer, exp clamped at 60. Only
            # sound while trained logits stay O(10) — the r4 100k run
            # grew them to 227 (p95 132), where the clamp silently
            # flattens attention and the chip path went NaN. Opt-in via
            # RDST_TPU_PALLAS_SOFTMAX=clamp for bounded-logit models.
            e = jnp.exp(jnp.minimum(s, _CLAMP)).astype(cdt)
        elif _softmax_variant() == "stable_mm":
            # MXU-broadcast stabilizer: per-head row maxes gathered to
            # (T, N, nH), broadcast back across each head's segment by
            # a thin matmul against the block-diagonal segment-ones
            # constant (contracting its nH dim), then ONE full-lane
            # subtract + exp instead of nH small exps + a lane concat.
            # Softmax invariance holds for ANY per-row constant, so the
            # bf16 rounding of the max through the MXU is harmless
            # (exp inputs <= ~bf16-eps * max, no overflow).
            m = jnp.concatenate(
                [jnp.max(s[:, :, h * N:(h + 1) * N], axis=-1,
                         keepdims=True) for h in range(nH)],
                axis=-1)  # (T, N, nH)
            mb = jax.lax.dot_general(
                m.astype(cdt), segones_ref[...].astype(cdt),
                (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (T, N, nH*N)
            e = jnp.exp(s - mb).astype(cdt)
        elif _softmax_variant() == "stable_bc":
            # r5 stretch attempt: same per-head row maxes, but the
            # SUBTRACTION is lane-concatenated broadcasts and the exp
            # runs ONCE at full lane width — trades (nH-1) extra VPU
            # exp passes for nH broadcast-concats. Exact softmax
            # invariance like 'stable'.
            mb = jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.max(s[:, :, h * N:(h + 1) * N], axis=-1,
                            keepdims=True), (T, N, N))
                 for h in range(nH)], axis=-1)
            e = jnp.exp(s - mb).astype(cdt)
        else:
            # segment-stable softmax (default): subtract each head
            # segment's row max before exp — exact softmax invariance,
            # exp inputs <= 0, denominators in (0, N] so the approx
            # reciprocal is well-conditioned at ANY logit magnitude.
            # Lane slices at N-aligned offsets are cheap (the precise
            # path and the K/V stack build use the same idiom); a lane
            # SPLIT reshape to (.., nH, N) is not Mosaic-safe here.
            segs = []
            for h in range(nH):
                seg = s[:, :, h * N:(h + 1) * N]
                mh = jnp.max(seg, axis=-1, keepdims=True)
                segs.append(jnp.exp(seg - mh))
            e = jnp.concatenate(segs, axis=-1).astype(cdt)
        den = jax.lax.dot_general(  # per-head softmax denominators
            e, segones_ref[...].astype(cdt), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (T, N, nH)
        dfull = jax.lax.dot_general(  # broadcast den to each head's channels
            den.astype(cdt), hmask_ref[...].astype(cdt),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (T, N, C)
        o = jax.lax.dot_general(
            e, vst, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (T, N, C)
        acc = (o / dfull if exact_recip
               else o * pl.reciprocal(dfull, approx=True))
    else:
        # precise per-head path: stable softmax, exact division
        acc = jnp.zeros((T, N, C), jnp.float32)
        for h in range(nH):
            m_h = hmask_ref[h:h + 1][None].astype(cdt)  # (1, 1, C)
            s = jax.lax.dot_general(
                q * m_h, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (T, N, N)
            # bias is bw-periodic over T (whole images or one chunk)
            if bw == 1:
                s = s + bias_ref[h].astype(jnp.float32)[None]
            else:
                b_h = bias_ref[h * bw:(h + 1) * bw].astype(jnp.float32)
                s = (s.reshape(T // bw, bw, N, N) + b_h[None]).reshape(T, N, N)
            p = jax.nn.softmax(s, axis=-1).astype(cdt)
            o_h = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (T, N, C)
            acc = acc + o_h * m_h.astype(jnp.float32)

    if "proj" in quant:
        wpq_ref, wps_ref = quant["proj"]
        accq, adq = _quant_dyn(acc.reshape(T * N, C))
        y = jnp.dot(accq, wpq_ref[...], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (wps_ref[...] * adq)
        y = y + bproj_ref[...].astype(jnp.float32)
    else:
        y = jnp.dot(acc.reshape(T * N, C).astype(cdt), wproj_ref[...],
                    preferred_element_type=jnp.float32)
        y = _bias_add(y, bproj_ref[...], mm_bias)

    if dpf is not None:
        y = y * dpf[0]
    x1 = xf + y  # residual 1 (f32)

    mq = quant.get("mlp")
    if fast:
        x1n_f = _normalize(x1, nseg)  # affine folded into w1/bf1
        x1n = None if mq else x1n_f.astype(cdt)
    else:
        g2 = g2_ref[...].astype(jnp.float32)
        b2 = b2_ref[...].astype(jnp.float32)
        x1n = _layernorm(x1, g2, b2).astype(cdt)
    if mq:
        w1q_ref, w1s_ref, w2q_ref, w2s_ref = mq
        h1 = jnp.dot(_quant_rows(x1n_f, _QX), w1q_ref[...],
                     preferred_element_type=jnp.int32)
        h1 = h1.astype(jnp.float32) * w1s_ref[...]
        h1 = h1 + bf1_ref[...].astype(jnp.float32)
        h1 = jax.nn.gelu(h1, approximate=True)
        h1q, hdq = _quant_dyn(h1)
        h2 = jnp.dot(h1q, w2q_ref[...], preferred_element_type=jnp.int32)
        h2 = h2.astype(jnp.float32) * (w2s_ref[...] * hdq)
        h2 = h2 + bf2_ref[...].astype(jnp.float32)
        return x1 + (h2 * dpf[1] if dpf is not None else h2)
    h1 = jnp.dot(x1n, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = _bias_add(h1, bf1_ref[...], mm_bias)
    if fast:
        h1 = jax.nn.gelu(h1, approximate=True).astype(cdt)
    else:
        # exact-GELU via polynomial erf (no erf/erfc primitive in Mosaic)
        h1 = (0.5 * h1 * (1.0 + _erf(h1 * (2.0**-0.5)))).astype(cdt)
    h2 = jnp.dot(h1, w2_ref[...], preferred_element_type=jnp.float32)
    h2 = _bias_add(h2, bf2_ref[...], mm_bias)

    return x1 + (h2 * dpf[1] if dpf is not None else h2)


def _block_kernel(nH, scale, T, N, C, fast, bw, nseg, quant,
                  x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                  g1_ref, b1_ref, g2_ref, b2_ref,
                  w1_ref, bf1_ref, w2_ref, bf2_ref,
                  bias_ref, hmask_ref, segones_ref, *qrefs):
    o_ref = qrefs[-1]
    qd, _ = unpack_mm_quant(qrefs[:-1], 0, quant)
    cdt = x_ref.dtype  # compute/storage dtype (bf16 on the bench path)
    xf = x_ref[0].astype(jnp.float32)  # (T*N, C)
    out = _body(xf, cdt, nH, scale, T, N, C, fast, bw,
                wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                g1_ref, b1_ref, g2_ref, b2_ref,
                w1_ref, bf1_ref, w2_ref, bf2_ref,
                bias_ref, hmask_ref, segones_ref, nseg, quant=qd)
    o_ref[0] = out.astype(o_ref.dtype)


def _windows_to_image(y, ipp, nwh, nww, ws):
    """(ipp·nW·ws², C) window_partition order -> (ipp, H, W, C), in VMEM
    (batch-dim transpose; the lane dim is never touched)."""
    c = y.shape[-1]
    y = y.reshape(ipp * nwh, nww, ws, ws, c)
    return y.transpose(0, 2, 1, 3, 4).reshape(ipp, nwh * ws, nww * ws, c)


def _image_to_windows(img, ipp, nwh, nww, ws):
    """(ipp, H, W, C) -> (ipp·nW·ws², C) window_partition order."""
    c = img.shape[-1]
    y = img.reshape(ipp * nwh, ws, nww, ws, c).transpose(0, 2, 1, 3, 4)
    return y.reshape(ipp * nwh * nww * ws * ws, c)


def _shift_relayout(y, ipp, nwh, nww, ws, s):
    """window layout -> roll(-s,-s)'d window layout, entirely in VMEM.

    y: (ipp·nWh·nWw·ws², C) in window_partition order. Equivalent to
    window_reverse -> roll(-s, -s) -> window_partition, expressed as
    batch-dim transposes + static sublane/batch concats so Mosaic never
    touches the lane dim. Pass s = H-s' (square images) to invert a
    forward shift s'."""
    y = _windows_to_image(y, ipp, nwh, nww, ws)
    if s:
        y = jnp.concatenate([y[:, s:], y[:, :s]], axis=1)  # roll -s (H)
        y = jnp.concatenate([y[:, :, s:], y[:, :, :s]], axis=2)  # roll -s (W)
    return _image_to_windows(y, ipp, nwh, nww, ws)


def _unshift_relayout(y, ipp, nwh, nww, ws, s):
    """Inverse of _shift_relayout: roll(+s, +s) between the layouts."""
    y = _windows_to_image(y, ipp, nwh, nww, ws)
    if s:
        y = jnp.concatenate([y[:, -s:], y[:, :-s]], axis=1)  # roll +s (H)
        y = jnp.concatenate([y[:, :, -s:], y[:, :, :-s]], axis=2)
    return _image_to_windows(y, ipp, nwh, nww, ws)


def _pair_kernel(nH, scale, T, N, C, nW, fast, geom, quant,
                 x_ref,
                 awqkv, abqkv, awproj, abproj, ag1, ab1, ag2, ab2,
                 aw1, abf1, aw2, abf2, abias,
                 bwqkv, bbqkv, bwproj, bbproj, bg1, bb1, bg2, bb2,
                 bw1, bbf1, bw2, bbf2, bbias,
                 hmask_ref, segones_ref, *qrefs):
    """DSTL pair: unshifted block -> in-VMEM shift relayout -> shifted
    block. Input in unshifted window layout; OUTPUT IN SHIFTED WINDOW
    LAYOUT (the caller's window_reverse + roll(+s) restores the image,
    one fused XLA copy — the same exit cost as a single block)."""
    ipp, nwh, nww, ws, shift = geom
    o_ref = qrefs[-1]
    qa, off = unpack_mm_quant(qrefs[:-1], 0, quant)
    qb, _ = unpack_mm_quant(qrefs[:-1], off, quant)
    cdt = x_ref.dtype
    xf = x_ref[0].astype(jnp.float32)
    y = _body(xf, cdt, nH, scale, T, N, C, fast, 1,
              awqkv, abqkv, awproj, abproj, ag1, ab1, ag2, ab2,
              aw1, abf1, aw2, abf2, abias, hmask_ref, segones_ref,
              quant=qa)
    # relayout in the compute dtype: same rounding the per-block path
    # pays storing the intermediate to HBM in bf16
    y2 = _shift_relayout(y.astype(cdt), ipp, nwh, nww, ws, shift)
    z = _body(y2.astype(jnp.float32), cdt, nH, scale, T, N, C, fast,
              nW if shift else 1,
              bwqkv, bbqkv, bwproj, bbproj, bg1, bb1, bg2, bb2,
              bw1, bbf1, bw2, bbf2, bbias, hmask_ref, segones_ref,
              quant=qb)
    o_ref[0] = z.astype(o_ref.dtype)


def _fold_fast_weights(wqkv, bqkv, g1, b1, g2, b2, w1, bf1, c, scale, dt):
    """Trace-time algebra, loop-invariant under jit (XLA hoists it):
    fold LN1's affine and the qk scale into wqkv/bqkv and LN2's affine
    into w1/bf1 — (x̂·γ+β)W + b = x̂·(γ⊙W) + (βW + b), and
    (qW_q + b_q)·s = q(sW_q) + s·b_q. The kernel then runs
    normalize-only LNs and no q·scale pass (3 full-width VPU passes
    saved per block). Folded biases stay f32: β@W can be O(√C) larger
    than the raw bias and bf16 rounding there would cost output dB for
    free."""
    f32 = jnp.float32
    qs = jnp.concatenate([jnp.full((c,), scale, f32),
                          jnp.ones((2 * c,), f32)])
    wqkv_f = g1.astype(f32)[:, None] * wqkv.astype(f32) * qs[None]
    bqkv_f = (b1.astype(f32) @ wqkv.astype(f32) + bqkv.astype(f32)) * qs
    w1_f = g2.astype(f32)[:, None] * w1.astype(f32)
    bf1_f = b2.astype(f32) @ w1.astype(f32) + bf1.astype(f32)
    return wqkv_f.astype(dt), bqkv_f, w1_f.astype(dt), bf1_f


def quant_flags() -> frozenset:
    """RDST_TPU_PALLAS_QUANT: comma list of int8 matmul groups for the
    RDSTB mega-kernel — any of qkv, mlp, proj, conv; 'all' = all four.
    Default: empty (bf16 everywhere). Read at TRACE time."""
    import os

    raw = os.environ.get("RDST_TPU_PALLAS_QUANT", "").strip().lower()
    if not raw or raw in ("0", "none"):
        return frozenset()
    if raw == "all":
        return frozenset(("qkv", "mlp", "proj", "conv"))
    flags = frozenset(p.strip() for p in raw.split(",") if p.strip())
    bad = flags - {"qkv", "mlp", "proj", "conv"}
    if bad:
        raise ValueError(f"RDST_TPU_PALLAS_QUANT: unknown groups {sorted(bad)}")
    return flags


def quantize_weight(w, act_step: float = 1.0):
    """Per-output-channel symmetric int8 weight quantization.

    Returns (wq int8, ws f32 (1, out)) with the activation dequant step
    pre-multiplied into ws so the kernel pays ONE f32 multiply per
    output: y = (xq @ wq) * ws + b."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-30)
    s = amax / 127.0
    wq = jnp.clip(jnp.round(w / s), -127.0, 127.0).astype(jnp.int8)
    return wq, (s * act_step).astype(jnp.float32)


# int8 matmul groups shared by the single-block / pair / RDSTB kernels
# (the RDSTB mega-kernel adds a 'conv' group of its own)
_MM_QUANT_SLOTS = {"qkv": 2, "mlp": 4, "proj": 2}


def mm_quant_groups(quant) -> frozenset:
    """Restrict a quant flag set to the matmul groups every Swin-block
    kernel supports (drops e.g. 'conv', which only fused_rdstb has)."""
    return frozenset(quant or ()) & frozenset(_MM_QUANT_SLOTS)


def unpack_mm_quant(refs, off, quant):
    """Per-block int8 extras at refs[off:]; returns (dict, new_off) in
    the fixed (qkv, mlp, proj) order mm_quant_extras emits."""
    q = {}
    for g in ("qkv", "mlp", "proj"):
        if g in quant:
            ns = _MM_QUANT_SLOTS[g]
            q[g] = tuple(refs[off:off + ns])
            off += ns
    return q, off


def mm_quant_extras(wqkv, w1, w2, wproj, quant):
    """int8 twins (+ per-channel scales) for one FOLDED fast-path block,
    in unpack_mm_quant order. qkv/fc1 inputs are post-normalize (static
    ±4σ step); fc2/proj inputs carry a dynamic per-tensor scale."""
    out = []
    if "qkv" in quant:
        out += quantize_weight(wqkv, act_step=1.0 / _QX)
    if "mlp" in quant:
        out += quantize_weight(w1, act_step=1.0 / _QX)
        out += quantize_weight(w2, act_step=1.0)
    if "proj" in quant:
        out += quantize_weight(wproj, act_step=1.0)
    return out


def use_fast_path(dtype) -> bool:
    """Packed clamped-softmax path for bf16; precise path for f32 (and
    when RDST_TPU_PALLAS_PRECISE=1).

    The env var is read at TRACE time: toggling it after a shape has
    been traced is ignored by the jit cache — call
    fused_swin_block.clear_cache() (tests do) when flipping it in one
    process."""
    import os

    if os.environ.get("RDST_TPU_PALLAS_PRECISE", "0") == "1":
        return False
    return jnp.dtype(dtype) == jnp.bfloat16


def _divisors_desc(nw: int):
    return [d for d in range(nw, 0, -1) if nw % d == 0]


def fused_block_fits(nw: int, n: int, c: int, nh: int, hidden: int,
                     es: int) -> bool:
    """True when the kernel can run this image geometry: either a whole
    image's windows fit the VMEM budget, or (fast path) some window
    chunk t | nW does — the grid then steps over chunks and each carries
    its own bias slice. Callers fall back to XLA otherwise.

    Must agree with use_fast_path (RDST_TPU_PALLAS_PRECISE forces the
    precise path even for bf16) or the gate would admit geometries the
    wrapper then rejects."""
    fast = es == 2 and use_fast_path(jnp.bfloat16)
    if _vmem_estimate(nw, n, c, nh, hidden, nw, es, fast) <= _VMEM_BUDGET:
        return True
    if not fast:
        return False
    return any(
        _vmem_estimate(d, n, c, nh, hidden, d, es, True) <= _VMEM_BUDGET
        for d in _divisors_desc(nw))


def _pair_vmem_estimate(t, n, c, nh, hidden, nw, es) -> float:
    """Peak-VMEM model for _pair_kernel (fast path only): the single-
    block fast peak plus the second weight set and the relayout
    temporaries (the allocator reuses block-a activations for block b)."""
    def pad(v):
        return -(-v // 128) * 128

    single = _vmem_estimate(t, n, c, nh, hidden, nw, es, fast=True)
    weights = (3 * c * pad(c) + c * pad(c) + c * pad(hidden)
               + hidden * pad(c)) * es
    relayout = 3 * t * n * pad(c) * es
    return single + 0.48 * weights + relayout


def fused_pair_fits(nw: int, n: int, c: int, nh: int, hidden: int,
                    es: int) -> bool:
    """True when a whole image's DSTL pair fits the VMEM budget (bf16
    fast path only; callers fall back to per-block kernels)."""
    if es != 2 or not use_fast_path(jnp.bfloat16):
        return False
    return _pair_vmem_estimate(nw, n, c, nh, hidden, nw, es) <= _VMEM_BUDGET


def shard_grid_over_data(fn, x, args, per_device_multiple: int):
    """Run ``fn(x, args)`` with x's leading dim split over the active
    data-mesh axis (jax.shard_map, that axis manual, any model/seq axes
    left to GSPMD). GSPMD cannot partition a pallas_call — an opaque
    custom call — so without this a batch-sharded input is all-gathered
    and EVERY device redundantly runs the whole grid (measured on the
    8-dev CPU mesh: the kernel output came back fully replicated).

    ``x`` may be a single array or a pytree of arrays that are ALL
    split on their leading dim (e.g. tokens + per-row DropPath factor
    columns); the divisibility gate checks the FIRST leaf against
    ``per_device_multiple``, so list batch-major operands whose leading
    dims are proportional. ``args`` is broadcast (replicated over the
    data axis).

    ``per_device_multiple``: x.shape[0] units that must stay together
    per device (windows_per_image for window-layout kernels — a device
    boundary through an image's windows would corrupt the shift
    relayout). Falls back to the unsharded call when no production mesh
    is registered (parallel.mesh.set_active_mesh) or the leading dim
    does not split cleanly.

    The registry is read at TRACE time: register the mesh before the
    first trace of any caller (the runners create their mesh in
    __init__, before any jit runs). A function object traced earlier
    keeps its cached jaxpr — same caveat as the quant env flags.
    """
    from rdst_tpu.parallel.mesh import active_data_mesh

    mesh, axis = active_data_mesh()
    lead = jax.tree_util.tree_leaves(x)[0].shape[0]
    if mesh is None or lead % (mesh.shape[axis] * per_device_multiple):
        return fn(x, args)
    from jax.sharding import PartitionSpec as P

    # check_vma=False: pallas out_shapes carry no varying-mesh-axes
    # annotation, so the checker rejects them; gradient correctness of
    # the replicated params (transpose -> psum over the data axis) is
    # gated in tests/test_kernel_sharding.py instead
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(axis), P()),
                         out_specs=P(axis), axis_names={axis},
                         check_vma=False)(x, args)


def fused_swin_block(x_windows, wqkv, bqkv, wproj, bproj,
                     g1, b1, g2, b2, w1, bf1, w2, bf2,
                     bias, *, num_heads: int, windows_per_image: int,
                     images_per_program: int = 1, pack: int = 1,
                     interpret: bool = False, quant: frozenset = None):
    """Data-parallel shim over `_fused_swin_block_jit` (same contract):
    splits B·nW over the active mesh's data axis so each device runs
    only its own images' grid steps."""
    # resolve the env gate HERE (unjitted) so the quant groups are part
    # of the jit cache key — flipping RDST_TPU_PALLAS_QUANT between
    # calls then retraces instead of serving a stale executable
    quant = mm_quant_groups(quant_flags() if quant is None else quant)
    call = functools.partial(
        _fused_swin_block_jit, num_heads=num_heads,
        windows_per_image=windows_per_image,
        images_per_program=images_per_program, pack=pack,
        interpret=interpret, quant=quant)
    return shard_grid_over_data(
        lambda x, a: call(x, *a), x_windows,
        (wqkv, bqkv, wproj, bproj, g1, b1, g2, b2, w1, bf1, w2, bf2, bias),
        windows_per_image)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "windows_per_image", "images_per_program",
                     "pack", "interpret", "quant"))
def _fused_swin_block_jit(x_windows, wqkv, bqkv, wproj, bproj,
                          g1, b1, g2, b2, w1, bf1, w2, bf2,
                          bias, *, num_heads: int, windows_per_image: int,
                          images_per_program: int = 1, pack: int = 1,
                          interpret: bool = False, quant: frozenset = None):
    """Whole Swin block on window-layout tokens.

    x_windows: (B·nW, N, C) with nW = windows_per_image;
    wqkv (C, 3C), bqkv (3C,) or None, wproj (C, C), bproj (C,),
    g1/b1/g2/b2 (C,) LayerNorm affines, w1 (C, H), bf1 (H,),
    w2 (H, C), bf2 (C,); bias (nH·bw, N, N) = rel-pos bias (+ shift
    mask), head-major, with bw = nW (per-window bias: shifted block)
    or bw = 1 (all windows share it: unshifted block — nW× less VMEM).
    Returns (B·nW, N, C).

    images_per_program batches several images' windows per grid step
    (bigger matmuls, fewer grid-step overheads); the mask tiles
    periodically. Per-program activations must stay well under the
    ~16 MB VMEM budget — clamped automatically via _vmem_estimate.
    """
    bnw, n, c = x_windows.shape
    nh = num_heads
    nw = windows_per_image
    es = jnp.dtype(x_windows.dtype).itemsize
    fast = use_fast_path(x_windows.dtype)
    quant = mm_quant_groups(quant_flags() if quant is None else quant)
    if not fast:
        quant = frozenset()  # int8 rides the packed fast path only
    if bqkv is None:
        bqkv = jnp.zeros((3 * c,), wqkv.dtype)

    # Window packing (pack=2, fast path): two windows share each lane
    # row, so C<=64 blocks run their VPU passes and K=C matmuls at ~2x
    # lane/MXU fill. The packed pair becomes 2nH "virtual heads" over 2C
    # channels with block-diagonal weights — the head-packing machinery
    # handles everything downstream except LayerNorm, which switches to
    # the nseg=2 segment form. Zero extra glue: XLA fuses the pack/unpack
    # permutations into the partition/reverse copies around the kernel.
    if pack != 1 and not (fast and pack == 2 and nw % 2 == 0
                          and bnw % 2 == 0
                          and any(
                              _vmem_estimate(d, n, 2 * c, 2 * nh,
                                             2 * w1.shape[1], d, es, True)
                              <= _VMEM_BUDGET
                              for d in _divisors_desc(nw // 2))):
        pack = 1
    if pack == 2:
        x_windows = (x_windows.reshape(bnw // 2, 2, n, c)
                     .transpose(0, 2, 1, 3).reshape(bnw // 2, n, 2 * c))

        def bd(m):  # (a, b) -> (2a, 2b) same-matrix block diagonal
            z = jnp.zeros(m.shape, m.dtype)
            return jnp.concatenate([
                jnp.concatenate([m, z], axis=1),
                jnp.concatenate([z, m], axis=1)], axis=0)

        def dup(v):  # (d,) -> (2d,) per-slot duplicate
            return jnp.concatenate([v, v])

        wqkv = jnp.concatenate(
            [bd(wqkv[:, i * c:(i + 1) * c]) for i in range(3)], axis=1)
        bqkv = jnp.concatenate(
            [dup(bqkv[i * c:(i + 1) * c]) for i in range(3)])
        wproj, bproj = bd(wproj), dup(bproj)
        w1, bf1 = bd(w1), dup(bf1)
        w2, bf2 = bd(w2), dup(bf2)
        g1, b1, g2, b2 = dup(g1), dup(b1), dup(g2), dup(b2)
        if bias.shape[0] == nh:  # shared bias: same rel-pos per slot
            bias = jnp.concatenate([bias, bias], axis=0)
        else:  # per-window: slot-major virtual heads, window pairs
            bias = (bias.reshape(nh, nw // 2, 2, n, n)
                    .transpose(2, 0, 1, 3, 4)
                    .reshape(2 * nh * (nw // 2), n, n))
        bnw, nw, c, nh = bnw // 2, nw // 2, 2 * c, 2 * nh

    bw = bias.shape[0] // nh  # bias windows: nW (per-window) or 1 (shared)
    assert bias.shape in ((nh * nw, n, n), (nh, n, n)), bias.shape
    hidden = w1.shape[1]

    def fits(t_, bw_):
        return _vmem_estimate(t_, n, c, nh, hidden, bw_, es,
                              fast) <= _VMEM_BUDGET

    if fits(nw, bw):
        # whole image(s) per program; batch up to ipp of them
        ipp = images_per_program
        while ipp > 1 and (bnw % (nw * ipp) != 0 or not fits(nw * ipp, bw)):
            ipp -= 1
        t = nw * ipp
        tile = bw  # bias tiling period over T: nW (per-window) or 1
        nblk = 1  # every grid step reads the same whole-image bias
    else:
        # window-chunked grid (large images): t | nW so chunks never
        # straddle an image; each chunk reads its own bias slice through
        # the modular BlockSpec index map. Fast path only (the precise
        # head-major bias stack is not chunk-contiguous).
        assert fast, "chunked fused_swin_block requires the bf16 fast path"
        t = next((d for d in _divisors_desc(nw) if fits(d, min(bw, d))), None)
        if t is None:  # pragma: no cover - the fits gates pre-screen this
            raise ValueError(
                f"no window chunk of nW={nw} fits VMEM at C={c}, nH={nh}")
        tile = min(bw, t)  # t when per-window bias, 1 when shared
        nblk = nw // t if tile > 1 else 1
    hd = c // nh
    scale = hd**-0.5
    grid = (bnw // t,)

    xg = x_windows.reshape(bnw // t, t * n, c)

    if fast:
        wqkv, bqkv, w1, bf1 = _fold_fast_weights(
            wqkv, bqkv, g1, b1, g2, b2, w1, bf1, c, scale, x_windows.dtype)

    quant_ops = []
    if quant:
        quant_ops = mm_quant_extras(wqkv, w1, w2, wproj, quant)
        # bf16 weights superseded by int8 twins never ship into VMEM
        dead = jnp.zeros((8, 128), x_windows.dtype)
        if "qkv" in quant:
            wqkv = dead
        if "mlp" in quant:
            w1, w2 = dead, dead
        if "proj" in quant:
            wproj = dead

    if fast:  # (bw, N, nH·N): heads packed on the lane dim
        bias_in = bias.reshape(nh, bw, n, n).transpose(1, 2, 0, 3)
        bias_in = bias_in.reshape(bw, n, nh * n)
        bias_spec = pl.BlockSpec((tile, n, nh * n),
                                 lambda i: (i % nblk, 0, 0))
    else:  # (nH·bw, N, N): head-major stack (whole images only)
        bias_in = bias
        bias_spec = pl.BlockSpec((nh * bw, n, n), lambda i: (0, 0, 0))

    kernel = functools.partial(_block_kernel, nh, scale, t, n, c, fast,
                               tile, pack, quant)
    vm = {} if (pltpu is None or interpret) else {"memory_space": pltpu.VMEM}
    if vm:
        bias_spec = pl.BlockSpec(bias_spec.block_shape, bias_spec.index_map,
                                 **vm)

    def const2d(a, b):
        return pl.BlockSpec((a, b), lambda i: (0, 0), **vm)

    def row(d):
        return const2d(1, d)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t * n, c), lambda i: (i, 0, 0), **vm),
            const2d(*wqkv.shape),           # wqkv (dead tile when int8)
            row(3 * c),                     # bqkv
            const2d(*wproj.shape),          # wproj
            row(c),                         # bproj
            row(c), row(c), row(c), row(c),  # g1 b1 g2 b2
            const2d(*w1.shape),             # w1
            row(hidden),                    # bf1
            const2d(*w2.shape),             # w2
            row(c),                         # bf2
            bias_spec,
            const2d(nh, c),                 # hmask
            const2d(nh * n, nh),            # segones
        ] + [const2d(*a.shape) for a in quant_ops],
        out_specs=pl.BlockSpec((1, t * n, c), lambda i: (i, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct(xg.shape, x_windows.dtype),
        interpret=interpret,
    )(
        xg, wqkv, bqkv.reshape(1, 3 * c), wproj, bproj.reshape(1, c),
        g1.reshape(1, c), b1.reshape(1, c), g2.reshape(1, c),
        b2.reshape(1, c), w1, bf1.reshape(1, hidden), w2,
        bf2.reshape(1, c), bias_in,
        _head_mask(nh, c, x_windows.dtype),
        _seg_ones(nh, n, x_windows.dtype),
        *quant_ops,
    )
    out = out.reshape(bnw, n, c)
    if pack == 2:  # unpack: (bnw', n, 2c) -> (2 bnw', n, c)
        c0 = c // 2
        out = (out.reshape(bnw, n, 2, c0).transpose(0, 2, 1, 3)
               .reshape(bnw * 2, n, c0))
    return out


def prep_block_params(params, c, nh, dt):
    """Fold + cast + reshape one block's 12-param bundle for a fused
    kernel (the exact bf16-before-fold rounding order of the
    single-block path). Shared by the pair and RDSTB wrappers."""
    wqkv, bqkv, wproj, bproj, g1, b1, g2, b2, w1, bf1, w2, bf2 = params
    if bqkv is None:
        bqkv = jnp.zeros((3 * c,), wqkv.dtype)
    wqkv, bqkv, w1, bf1 = (a.astype(dt) for a in (wqkv, bqkv, w1, bf1))
    scale = (c // nh) ** -0.5
    wqkv, bqkv, w1, bf1 = _fold_fast_weights(
        wqkv, bqkv, g1, b1, g2, b2, w1, bf1, c, scale, dt)
    hid = w1.shape[1]
    return [wqkv.astype(dt), bqkv.reshape(1, 3 * c),
            wproj.astype(dt), bproj.astype(dt).reshape(1, c),
            g1.reshape(1, c), b1.reshape(1, c),
            g2.reshape(1, c), b2.reshape(1, c),
            w1.astype(dt), bf1.reshape(1, hid),
            w2.astype(dt), bf2.astype(dt).reshape(1, c)]


def pack_bias_fast(bias, nh, n, dt):
    """Head-major (nH·bw, N, N) -> fast-layout (bw, N, nH·N)."""
    bwin = bias.shape[0] // nh
    out = bias.reshape(nh, bwin, n, n).transpose(1, 2, 0, 3)
    return out.reshape(bwin, n, nh * n).astype(dt)


def const_spec(vm, *shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd, **vm)


def fused_swin_pair(x_windows, params_a, bias_a, params_b, bias_b, *,
                    num_heads: int, x_size, window_size: int, shift: int,
                    images_per_program: int = 2, interpret: bool = False,
                    quant: frozenset = None):
    """Data-parallel shim over `_fused_swin_pair_jit` (same contract):
    splits B·nW over the active mesh's data axis at image boundaries."""
    # env gate resolved unjitted -> part of the jit cache key (see
    # fused_swin_block)
    quant = mm_quant_groups(quant_flags() if quant is None else quant)
    nw = (x_size[0] // window_size) * (x_size[1] // window_size)
    call = functools.partial(
        _fused_swin_pair_jit, num_heads=num_heads, x_size=tuple(x_size),
        window_size=window_size, shift=shift,
        images_per_program=images_per_program, interpret=interpret,
        quant=quant)
    return shard_grid_over_data(
        lambda x, a: call(x, *a), x_windows,
        (params_a, bias_a, params_b, bias_b), nw)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "x_size", "window_size", "shift",
                     "images_per_program", "interpret", "quant"))
def _fused_swin_pair_jit(x_windows, params_a, bias_a, params_b, bias_b, *,
                         num_heads: int, x_size, window_size: int, shift: int,
                         images_per_program: int = 2, interpret: bool = False,
                         quant: frozenset = None):
    """One DSTL's Swin-block pair (shift 0, then `shift`) in a single
    Pallas program: the inter-block window_reverse -> roll -> partition
    happens in VMEM (_shift_relayout), so the intermediate feature map
    never round-trips HBM and XLA's per-boundary relayout copy is gone.

    x_windows: (B·nW, N, C) in UNSHIFTED window_partition order.
    params_X = (wqkv, bqkv|None, wproj, bproj, g1, b1, g2, b2,
                w1, bf1, w2, bf2) for each block.
    bias_a: (nH, N, N) — block a is unshifted, all windows share it.
    bias_b: (nH·nW, N, N) when shift > 0 (rel-pos + shift mask,
            per-window), else (nH, N, N).
    Returns (B·nW, N, C) in SHIFTED window layout — callers undo it
    with window_reverse + roll(+shift), one fused XLA copy (the same
    exit glue a single block pays).

    bf16 fast path only (use_fast_path must hold).
    """
    bnw, n, c = x_windows.shape
    nh = num_heads
    h, w = x_size
    ws = window_size
    nwh, nww = h // ws, w // ws
    nw = nwh * nww
    es = jnp.dtype(x_windows.dtype).itemsize
    assert use_fast_path(x_windows.dtype), "pair kernel is fast-path only"
    quant = mm_quant_groups(quant_flags() if quant is None else quant)
    hidden = params_a[8].shape[1]

    ipp = max(1, images_per_program)
    while ipp > 1 and (bnw % (nw * ipp) != 0
                       or _pair_vmem_estimate(nw * ipp, n, c, nh, hidden,
                                              nw, es) > _VMEM_BUDGET):
        ipp -= 1
    t = nw * ipp
    grid = (bnw // t,)
    dt = x_windows.dtype

    vm = {} if (pltpu is None or interpret) else {"memory_space": pltpu.VMEM}

    def prep(params):
        folded = prep_block_params(params, c, nh, dt)
        extras = mm_quant_extras(folded[0], folded[8], folded[10],
                                 folded[2], quant)
        if quant:  # superseded bf16 weights never ship into VMEM
            dead = jnp.zeros((8, 128), dt)
            if "qkv" in quant:
                folded[0] = dead
            if "mlp" in quant:
                folded[8], folded[10] = dead, dead
            if "proj" in quant:
                folded[2] = dead
        return folded, extras

    def const(*shape):
        return const_spec(vm, *shape)

    bias_a_in = pack_bias_fast(bias_a, nh, n, dt)
    bias_b_in = pack_bias_fast(bias_b, nh, n, dt)
    geom = (ipp, nwh, nww, ws, shift)
    kernel = functools.partial(_pair_kernel, nh, (c // nh) ** -0.5, t, n, c,
                               nw, True, geom, quant)

    fa, qa = prep(params_a)
    fb, qb = prep(params_b)
    xg = x_windows.reshape(bnw // t, t * n, c)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [pl.BlockSpec((1, t * n, c), lambda i: (i, 0, 0), **vm)]
            + [const(*a.shape) for a in fa]
            + [const(*bias_a_in.shape)]
            + [const(*a.shape) for a in fb]
            + [const(*bias_b_in.shape)]
            + [const(nh, c), const(nh * n, nh)]  # hmask, segones
            + [const(*a.shape) for a in qa + qb]
        ),
        out_specs=pl.BlockSpec((1, t * n, c), lambda i: (i, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct(xg.shape, dt),
        interpret=interpret,
    )(xg, *fa, bias_a_in, *fb, bias_b_in,
      _head_mask(nh, c, dt), _seg_ones(nh, n, dt), *qa, *qb)
    return out.reshape(bnw, n, c)


@functools.partial(jax.jit, static_argnames=("nh", "c", "dtype"))
def _head_mask(nh: int, c: int, dtype) -> jax.Array:
    """(nH, C) one-hot channel masks: m[h, ch] = 1 iff ch // hd == h."""
    return head_mask_arr(nh, c, dtype)


@functools.partial(jax.jit, static_argnames=("nh", "n", "dtype"))
def _seg_ones(nh: int, n: int, dtype) -> jax.Array:
    """(nH·N, nH) segment-sum matrix: S[h·N+j, h'] = 1 iff h == h'."""
    return seg_ones_arr(nh, n, dtype)


def head_mask_arr(nh: int, c: int, dtype) -> jax.Array:
    """Raw (unjitted) _head_mask builder: iota lowers inside Pallas
    kernel bodies too, so the train kernel (pair_train.py) builds the
    masks in-kernel from the same code."""
    hd = c // nh
    ch = jax.lax.broadcasted_iota(jnp.int32, (nh, c), 1)
    hh = jax.lax.broadcasted_iota(jnp.int32, (nh, c), 0)
    return (ch // hd == hh).astype(dtype)


def seg_ones_arr(nh: int, n: int, dtype) -> jax.Array:
    """Raw (unjitted) _seg_ones builder (see head_mask_arr)."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (nh * n, nh), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (nh * n, nh), 1)
    return (jj // n == kk).astype(dtype)


# tests/tools flip trace-time env flags (precise path, quant, VMEM
# budget monkeypatches) and drop stale traces via the public names;
# the jit moved onto the impls when the data-parallel shims landed
fused_swin_block.clear_cache = _fused_swin_block_jit.clear_cache
fused_swin_pair.clear_cache = _fused_swin_pair_jit.clear_cache
