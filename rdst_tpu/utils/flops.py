"""Parameter / FLOP counting (replaces the reference's analytic
``.flops()`` methods and utils/count_flops.py).

Uses jax's cost analysis on the compiled executable — exact for the
whole jitted forward (covers attention, convs, norms), not a hand
formula per layer.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(v.shape) for v in jax.tree.leaves(params)))


def count_flops(fn, *args) -> Tuple[float, dict]:
    """(total FLOPs, full cost dict) of the compiled jitted callable."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", float("nan"))), dict(cost)


def model_summary(model, params, x, **kwargs) -> str:
    n = count_params(params)
    try:
        flops, _ = count_flops(lambda p, xx: model.apply(p, xx, **kwargs), params, x)
        gf = f"{flops / 1e9:.2f} GFLOPs @ {tuple(x.shape)}"
    except Exception as e:  # cost analysis unsupported on some backends
        gf = f"(flops unavailable: {e})"
    return f"{type(model).__name__}: {n / 1e6:.3f}M params, {gf}"
