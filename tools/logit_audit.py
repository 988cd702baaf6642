#!/usr/bin/env python
"""Stamp a checkpoint's audited attention-logit bound into its sidecar.

``pallas_softmax='auto'`` (kernels/logit_audit.py) picks the faster
clamp softmax only for checkpoints whose max attention logit is audited
below the safety margin; snapshots trained before r5 (and torch
imports) have no stamp and therefore resolve to the stable softmax.
This tool measures the bound over real validation slices and merges
``attn_logit_max`` into the ``<weights>.stats.json`` sidecar.

Runs on CPU by default (logit magnitudes are platform-independent and
the chip is usually busy with the measurement queue):

    python tools/logit_audit.py --config-file config_files/<cfg>.ini \
        [--weights weights/<snapshot>.msgpack] [--n-slices 16]

Prints one JSON line: {"weights": ..., "attn_logit_max": ..., "resolves": ...}
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weights", default=None,
                    help="snapshot path (default: the config's "
                         "well_trained_* key)")
    ap.add_argument("--n-slices", type=int, default=16)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of CPU")
    args = ap.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rdst_tpu.checkpoint.loading import (load_well_trained_params,
                                             resolve_model_path)
    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.kernels.logit_audit import measure_logit_bound
    from rdst_tpu.kernels.swin_block import resolve_softmax_auto
    from rdst_tpu.models import build_generator

    paras = ParametersLoader(args.config_file)
    paras.set("multi_threads", 1)
    path = args.weights or resolve_model_path(paras)
    assert path and os.path.exists(path), f"no weights at {path!r}"

    _, ds_valid = make_train_valid_datasets(paras)
    pair0 = ds_valid.get_test_pair(0)
    scale = sorted(pair0.keys())[-1]
    xs, i = [], 0
    while sum(a.shape[0] for a in xs) < args.n_slices and i < ds_valid.test_len():
        xs.append(ds_valid.get_test_pair(i)[scale]["in"])
        i += 1
    x = jnp.asarray(np.concatenate(xs, axis=0)[:args.n_slices])

    model = build_generator(paras, dtype=jnp.float32)
    scales = [float(s) for s in paras.get("sr_scales_for_final_testing",
                                          paras.test_sr_scales)]
    params = load_well_trained_params(model, paras, path, scales)
    bound = measure_logit_bound(model, params, x, float(scale))

    sidecar = os.path.splitext(path)[0] + ".stats.json"
    stats = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            stats = json.load(f)
    if bound is not None:
        stats["attn_logit_max"] = round(float(bound), 3)
        with open(sidecar, "w") as f:
            json.dump(stats, f)
    print(json.dumps({
        "weights": path,
        "n_slices": int(x.shape[0]),
        "attn_logit_max": None if bound is None else round(float(bound), 3),
        "resolves": resolve_softmax_auto(bound),
        "sidecar": sidecar if bound is not None else None,
    }))


if __name__ == "__main__":
    main()
