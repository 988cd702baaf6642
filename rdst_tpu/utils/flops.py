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


def main(argv=None):
    """Compiled-cost CLI: params, FLOPs, HBM bytes for any config.

    Predicts whether a geometry is compute- or bandwidth-bound before
    burning chip time (docs/SCALING.md). ``--grad`` adds the training
    proxy (value_and_grad of an L1 loss over the forward).
    """
    import argparse
    import json

    ap = argparse.ArgumentParser(description="compiled-cost analysis")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--lr-hw", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="LR input shape (default: config patch_size)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--scale", type=float, default=4.0)
    ap.add_argument("--grad", action="store_true",
                    help="also cost the L1 value_and_grad (train proxy)")
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. 'cpu')")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.models import build_generator

    paras = ParametersLoader(args.config_file)
    hw = tuple(args.lr_hw or (paras.patch_size, paras.patch_size))
    b = int(args.batch or paras.batch_size)
    model = build_generator(paras)
    x = jnp.zeros((b, hw[0], hw[1], paras.input_channel), jnp.float32)
    params = jax.jit(lambda r, xx: model.init(r, xx, args.scale))(
        jax.random.PRNGKey(0), x)

    out = {"model": str(paras.get("feature_generator")),
           "params": count_params(params),
           "lr_shape": [b, *hw, int(paras.input_channel)],
           "scale": args.scale}
    flops, cost = count_flops(
        lambda p, xx: model.apply(p, xx, args.scale), params, x)
    out["forward_flops"] = flops
    out["forward_bytes"] = cost.get("bytes accessed", float("nan"))
    if args.grad:
        def loss(p, xx):
            return jnp.mean(jnp.abs(model.apply(p, xx, args.scale)))

        gflops, gcost = count_flops(
            lambda p, xx: jax.value_and_grad(loss)(p, xx), params, x)
        out["grad_flops"] = gflops
        out["grad_bytes"] = gcost.get("bytes accessed", float("nan"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
