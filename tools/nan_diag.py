#!/usr/bin/env python
"""On-chip NaN diagnosis for the 100k-run quick-eva failure (round 4).

Observed: from ~90k steps of the RDST-E1 100k o20 run, quick-eva and
final-eva report NaN on the REAL device, while the saved params are
fully finite (max |param| 1.55) and every CPU path — f32 XLA, bf16
XLA, bf16 rdstb/pair in interpret mode — is finite on the same inputs.
Suspects are therefore Mosaic-fast-path-only semantics: the
approximate reciprocal and/or the dropped softmax max-subtract
(kernels/swin_block.py fast path), in a parameter regime the longer
schedule reached (bf16-vs-f32 maxdiff grew to ~0.1 at 100k vs ~0.01
at 40k).

Runs the final 100k params through four paths ON THE CHIP over the
actual o20 validation slices and reports per-path non-finite counts +
max diff vs f32 XLA. One JSON line at the end (NAN_DIAG.json).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

MODEL = "outputs/RDST_E1_100K_O20_None/models/WarmUP_model_g.msgpack"


def main():
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.models import build_generator

    paras = ParametersLoader("config_files/rdst_e1_100k_oasis20_x4.ini")
    paras.set("multi_threads", 1)
    _, ds_valid = make_train_valid_datasets(paras)
    pairs = [ds_valid.get_test_pair(i)
             for i in range(min(16, ds_valid.test_len()))]
    x = jnp.asarray(np.concatenate([p[4.0]["in"] for p in pairs], axis=0))
    print("inputs:", x.shape, flush=True)

    results = {}

    def fwd(tag, mode, dtype):
        os.environ["RDST_TPU_PALLAS"] = mode
        from rdst_tpu.kernels import clear_kernel_caches

        clear_kernel_caches()
        m = build_generator(paras, dtype=dtype)
        p0 = jax.jit(m.init)(jax.random.PRNGKey(0), x[:1])
        with open(MODEL, "rb") as f:
            p = serialization.from_bytes(p0, f.read())
        y = np.asarray(jax.device_get(jax.jit(m.apply)(p, x)), np.float32)
        results[tag] = y
        fin = np.isfinite(y)
        rec = {"nonfinite": int((~fin).sum()), "size": y.size,
               "max_abs": float(np.abs(y[fin]).max()) if fin.any() else None}
        if "f32_xla" in results and tag != "f32_xla":
            d = np.abs(y - results["f32_xla"])
            dfin = np.isfinite(d)
            # all-NaN outputs are the very scenario under diagnosis —
            # record None instead of crashing on an empty reduction
            rec["maxdiff_vs_f32"] = (float(d[dfin].max())
                                     if dfin.any() else None)
        print(tag, rec, flush=True)
        return rec

    out = {
        "f32_xla": fwd("f32_xla", "0", jnp.float32),
        "bf16_xla": fwd("bf16_xla", "0", jnp.bfloat16),
        "bf16_rdstb": fwd("bf16_rdstb", "rdstb", jnp.bfloat16),
        "bf16_pair": fwd("bf16_pair", "pair", jnp.bfloat16),
        "bf16_swin": fwd("bf16_swin", "swin", jnp.bfloat16),
    }
    with open("NAN_DIAG.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
