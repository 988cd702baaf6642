"""Pallas kernel-mode dispatch (env-driven, read at TRACE time).

This module once held the round-1 attention-only and qkv+attn+proj
kernels (modes '1' / 'block'). Both measured SLOWER than plain XLA
fusion twice — r1: 377 / 503 vs 669 slices/s; r3 re-measurement:
377 / 504 vs 669 XLA and 2884 mega-kernel (v5e-lite, RDST-E1, OASIS
x4, bf16) — because per-head hd=10..25 matmuls serialize poorly
against XLA's giant batched GEMMs. They were retired in r3 per the
negative result (PERF.md keeps the record; `git log` has the code).
Requesting those modes now falls through to the XLA attention path.

The production kernels live in kernels/swin_block.py (single fused
block, DSTL pair) and kernels/rdstb_block.py (whole-RDSTB mega-kernel,
the default).
"""

from __future__ import annotations

import os


def pallas_mode():
    """'rdstb' (default: whole-RDSTB mega-kernel where it fits — 2884
    slices/s at RDST-E1 shapes, v5e-lite — with DSTL-pair then
    single-block fused fallbacks for non-RDSTB structures) | 'pair'
    (DSTL-pair fused, 2475) | 'swin' (single fused whole-block, 2178) |
    'pack' (two windows per lane row at C<=64 — SLOWER at RDST-E1
    shapes: 1968, faster nowhere measured yet) | '0'/'off' (pure XLA,
    669). Retired: '1'/'block' (see module docstring) — both now run
    the XLA path."""
    mode = os.environ.get("RDST_TPU_PALLAS", "")
    if mode in ("0", "false", "off"):
        return ""
    return mode or "rdstb"


def pallas_interpret() -> bool:
    """Force interpret-mode kernels (CPU tests of the gated path)."""
    return os.environ.get("RDST_TPU_PALLAS_INTERPRET", "0") == "1"


def export_kernel_flags(paras) -> None:
    """Export a config's kernel keys to the env flags the trace-time
    gates read. Call BEFORE the first trace (the runners do, right
    before ``build_generator``).

    ``pallas_kernels`` -> ``RDST_TPU_PALLAS``      (rdstb/pair/swin/pack/off)
    ``pallas_quant``   -> ``RDST_TPU_PALLAS_QUANT`` (int8 groups:
                          comma list of qkv/mlp/proj/conv, or all/off)

    A key that is absent (or None) leaves the env untouched, so the env
    stays the manual override surface (tools/kernel_sweep.py drives it
    per point); a PRESENT key wins over any inherited env value, with
    off/none/0/false/xla exporting the explicit off value. Framework
    extension — the reference has no kernel layer to configure.

    Consequence of absent-leaves-env: in a process that builds runners
    for SEVERAL configs, a config that sets these keys contaminates
    later runners whose configs omit them. Multi-config drivers must
    pop/reset the env between runners (tools/bench_all.py does), or
    configs can pin ``pallas_kernels='rdstb'``/``pallas_quant='off'``
    explicitly.
    """
    for cfg_key, env in (("pallas_kernels", "RDST_TPU_PALLAS"),
                         ("pallas_quant", "RDST_TPU_PALLAS_QUANT")):
        val = paras.get(cfg_key) if hasattr(paras, "get") else None
        if val is None:
            continue
        val = str(val).strip().lower()
        os.environ[env] = (
            "0" if val in ("", "none", "off", "false", "xla", "0") else val)
    # pallas_softmax -> RDST_TPU_PALLAS_SOFTMAX (auto/stable/clamp/
    # stable_mm). 'auto' is resolved against the checkpoint's audited
    # attn_logit_max stamp by checkpoint.loading.resolve_pallas_softmax
    # (tester/serving/bench call it after the weight path is known).
    val = paras.get("pallas_softmax") if hasattr(paras, "get") else None
    if val is not None:
        val = str(val).strip().lower()
        if val in ("", "none", "default"):
            os.environ.pop("RDST_TPU_PALLAS_SOFTMAX", None)
        elif val in ("auto", "stable", "clamp", "stable_mm", "stable_bc"):
            os.environ["RDST_TPU_PALLAS_SOFTMAX"] = val
        else:
            raise ValueError(
                f"pallas_softmax={val!r}: expected auto/stable/clamp/"
                "stable_mm/stable_bc")


def pallas_train_mode() -> str:
    """Kernel mode for the TRAINING step (forward + backward both run
    fused — kernels/pair_train.py). '' (XLA autodiff) | 'pair'
    (differentiable DSTL-pair kernel; requires the bf16 fast path,
    i.e. training_dtype='bfloat16'). Hardware-measured 2.2x over XLA
    autodiff at the flagship bf16 geometry (33.9 vs 15.5 steps/s
    chip-paced, BENCH_EXTRA record 9), so runners/trainer.py defaults
    it ON for bf16 training; set RDST_TPU_PALLAS_TRAIN or the
    `pallas_train` config key to override."""
    mode = os.environ.get("RDST_TPU_PALLAS_TRAIN", "")
    return "" if mode in ("0", "false", "off") else mode
