"""Attention-logit audit: the measurement behind ``pallas_softmax='auto'``.

The fast-path clamp softmax (kernels/swin_block.py, ``_CLAMP = 60``) is
~7.7% faster at the flagship inference geometry and ~27% faster for the
pair train kernel, but silently flattens attention once trained logits
exceed the clamp — the r4 100k-schedule run grew them to 227 and went
NaN on hardware (PERF.md). The reference computes exact softmax at any
magnitude (/root/reference/networks/swin_transformer_sr.py:120-134), so
clamp is only admissible when a checkpoint's logits are AUDITED bounded.

This module measures that bound: run the model through the XLA module
path with ``RDST_TPU_LOGIT_AUDIT=1`` so every ``WindowAttention`` sows
its max attention logit (post scale/bias/mask — exactly the value the
kernel clamps), and take the max across layers. Consumers:

* the trainer probes at every quick-eva and stamps ``attn_logit_max``
  into the snapshot's stats sidecar (runners/trainer.py),
* ``tools/logit_audit.py`` stamps existing/imported checkpoints offline,
* ``checkpoint.loading.resolve_pallas_softmax`` resolves ``auto``
  against the stamp at weight-load time,
* ``bench.py`` self-audits its params before the timed sweep.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def _audit_env():
    """Force the XLA module path with logit sowing for traces opened
    inside the block, restoring the kernel env (and wrapper caches —
    trace-time reads) on exit."""
    from rdst_tpu.kernels import clear_kernel_caches

    saved = {k: os.environ.get(k)
             for k in ("RDST_TPU_PALLAS", "RDST_TPU_LOGIT_AUDIT")}
    os.environ["RDST_TPU_PALLAS"] = "0"
    os.environ["RDST_TPU_LOGIT_AUDIT"] = "1"
    clear_kernel_caches()
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        clear_kernel_caches()


def _extract_bound(mutated) -> Optional[float]:
    vals = [v for path, v in
            jax.tree_util.tree_flatten_with_path(mutated)[0]
            if any(getattr(p, "key", None) == "attn_logit_max"
                   for p in path)]
    if not vals:
        return None  # no window attention in this model
    import numpy as np

    return float(np.max(np.asarray([jax.device_get(v) for v in vals])))


def make_logit_probe(model, *apply_args, **apply_kwargs) -> Callable:
    """Build ``probe(params, x) -> float | None`` for one model.

    The jitted probe is traced ONCE under the audit env (trace-time
    gates bake the sow + XLA path into the compiled program), so
    repeated probes — the trainer calls one per quick-eva — cost a
    single extra dispatch, not a recompile. ``apply_args`` are the
    static trailing apply arguments (e.g. ``sr_factor``).
    """
    cache: dict = {}

    def probe(params, x) -> Optional[float]:
        if "fn" not in cache:
            fn = jax.jit(lambda p, xx: model.apply(
                p, xx, *apply_args, mutable=["intermediates"],
                **apply_kwargs)[1])
            with _audit_env():
                out = fn(params, x)  # first call == trace, under audit
            cache["fn"] = fn
        else:
            out = cache["fn"](params, x)
        return _extract_bound(out)

    return probe


def measure_logit_bound(model, params, x, *apply_args,
                        **apply_kwargs) -> Optional[float]:
    """One-shot bound measurement (offline stamping, bench self-audit).

    Returns None for models with no window attention — the softmax
    variant is then irrelevant (no fused swin kernels run)."""
    return make_logit_probe(model, *apply_args, **apply_kwargs)(params, x)
