"""TPU compile-level check of rdst_remat: HBM temp bytes of the
flagship grad step with and without per-RDSTB rematerialization.

Compile-only (no execution): safe on a busy chip, ~1-2 min. Decides
whether the flagship training config should ship rdst_remat=True.

    python tools/remat_memcheck.py [--config-file ...] [--batch 32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file",
                    default="config_files/rdst_e1_40k_oasis20_x4.ini")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.models import build_generator

    p = ParametersLoader(args.config_file)

    def temp_bytes(remat):
        p.set("rdst_remat", remat)
        model = build_generator(p)
        x = jnp.zeros((args.batch, p.patch_size, p.patch_size,
                       p.input_channel), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        def loss(v, xx):
            out = model.apply(v, xx, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(1),
                                    "droppath": jax.random.PRNGKey(2)})
            return jnp.mean(jnp.abs(out))

        c = jax.jit(jax.grad(loss)).lower(params, x).compile()
        m = c.memory_analysis()
        return {k: int(getattr(m, k, 0) or 0)
                for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                          "output_size_in_bytes")}

    out = {"batch": args.batch, "config": args.config_file,
           "no_remat": temp_bytes(False), "remat": temp_bytes(True)}
    t0, t1 = (out["no_remat"]["temp_size_in_bytes"],
              out["remat"]["temp_size_in_bytes"])
    out["temp_ratio"] = (t1 / t0) if t0 else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
