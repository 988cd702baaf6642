#!/usr/bin/env python
"""Kernel-mode throughput sweep on the real TPU (any generator config
via --config=; default RDST-E1 bench geometry).

Runs bench.py's exact methodology (HBM-resident volumes, one jitted
fori_loop sweep per measurement, single fetch) across Pallas modes and
images_per_program settings, sharing the model/params/data setup so each
extra point only pays its own compile + first-execution cost.

Usage:  python tools/kernel_sweep.py [--config=FILE.ini] [mode[+flags][:ipp] ...]
        default points: 0 swin pair rdstb rdstb:4 pack
        flags = dot-joined extras: int8 quant groups
        (qkv/mlp/proj/conv/all -> RDST_TPU_PALLAS_QUANT).
        e.g. rdstb+qkv.mlp, rdstb+all, pair+all

Each mode is traced fresh (the mode env vars are read at trace time).
Prints one table row per point, plus FLOPs/slice (XLA cost analysis of
the mode-0 path: Pallas-internal FLOPs are invisible to the counter, so
the XLA path is the one honest numerator for every mode) and MFU vs the
chip's bf16 peak (SWEEP_PEAK_TFLOPS, default 197 = v5e). Paste winners
into PERF.md and make the best mode the bench default.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLICES_PER_VOLUME = int(os.environ.get("SWEEP_SLICES", 128))
LR_SHAPE = (40, 32, 1)
N_DISTINCT_VOLUMES = 2
N_ITERS = int(os.environ.get("SWEEP_ITERS", 16))


def main():
    argv = sys.argv[1:]
    config = "config_files/rdst_e1_oasis_x4.ini"
    stamp = None
    points = []
    it = iter(argv)
    for a in it:  # --config anywhere, both --config=F and --config F forms
        if a.startswith("--config="):
            config = a.split("=", 1)[1]
        elif a == "--config":
            config = next(it, None)
            if config is None:
                sys.exit("--config requires a FILE.ini argument")
        elif a.startswith("--stamp="):
            # resolve pallas_softmax='auto' against THIS checkpoint's
            # audited sidecar instead of the fresh-init self-audit —
            # the table cells describe inference of the TRAINED model
            # (e.g. SwinIR-light's trained logits audit at 64.2, ABOVE
            # the 60 clamp, so its cell must be measured stable even
            # though a fresh init would resolve clamp)
            stamp = a.split("=", 1)[1]
        elif a.startswith("--"):
            sys.exit(f"unknown option {a!r} (see module docstring)")
        else:
            points.append(a)
    points = points or ["0", "swin", "pair", "rdstb", "rdstb:4", "pack"]

    # validate every point BEFORE the expensive jax/TPU setup
    KNOWN_MODES = {"0", "off", "false", "swin", "pair", "rdstb", "pack",
                   "1", "block"}  # 1/block are retired -> XLA fallthrough
    KNOWN_FLAGS = {"qkv", "mlp", "proj", "conv", "all"}
    for point in points:
        mode, _, _ipp = point.partition(":")
        mode, _, flags = mode.partition("+")
        if mode not in KNOWN_MODES or set(flags.split(".")) - {""} - KNOWN_FLAGS:
            sys.exit(f"unknown sweep point {point!r}: mode must be one of "
                     f"{sorted(KNOWN_MODES)} and flags from "
                     f"{sorted(KNOWN_FLAGS)} (unknown modes would silently "
                     "measure the XLA path)")

    import jax
    import jax.numpy as jnp

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data.ops_jax import resize_nhwc
    from rdst_tpu.metrics import jax_metrics
    from rdst_tpu.models import build_generator

    dtype = jnp.bfloat16
    paras = ParametersLoader(config)
    model = build_generator(paras, dtype=dtype)
    model32 = build_generator(paras)

    rng = np.random.default_rng(0)
    hr_shape = (SLICES_PER_VOLUME, LR_SHAPE[0] * 4, LR_SHAPE[1] * 4, 1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1,) + LR_SHAPE))

    # r5: measure under the SHIPPED softmax config — resolve the
    # config's pallas_softmax key, incl. 'auto' against THIS param
    # set's measured logit bound (fresh init = bounded, so auto
    # legitimately selects the clamp fast path, same as bench.py)
    from rdst_tpu.kernels.window_attention import export_kernel_flags

    export_kernel_flags(paras)
    if os.environ.get("RDST_TPU_PALLAS_SOFTMAX") == "auto":
        from rdst_tpu.kernels.swin_block import resolve_softmax_auto

        if stamp:
            from rdst_tpu.checkpoint.loading import read_stats_sidecar

            bound = (read_stats_sidecar(stamp) or {}).get("attn_logit_max")
        else:
            from rdst_tpu.kernels.logit_audit import measure_logit_bound

            xa = jnp.asarray(np.random.default_rng(1).random(
                (4,) + LR_SHAPE, dtype=np.float32))
            bound = measure_logit_bound(model32, params, xa)
        os.environ["RDST_TPU_PALLAS_SOFTMAX"] = resolve_softmax_auto(bound)
    print("softmax variant:",
          os.environ.get("RDST_TPU_PALLAS_SOFTMAX") or "stable", flush=True)
    volumes = jax.device_put(
        rng.random((N_DISTINCT_VOLUMES,) + hr_shape, dtype=np.float32))

    # f32 reference output for the agreement check (one volume)
    os.environ["RDST_TPU_PALLAS"] = "0"
    lr0 = resize_nhwc(volumes[0], LR_SHAPE[:2], "cubic")
    ref32 = np.asarray(jax.jit(model32.apply)(params, lr0))

    # FLOPs per slice from the XLA path (same math every mode runs)
    def eva_volume0(p, hr):
        lr = resize_nhwc(hr, LR_SHAPE[:2], "cubic").astype(dtype)
        sr = model.apply(p, lr).astype(jnp.float32)
        return jax_metrics.psnr(jax_metrics.crop_margin(hr, 4),
                                jax_metrics.crop_margin(sr, 4))

    cost = jax.jit(eva_volume0).lower(params, volumes[0]).compile(
        ).cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops_per_slice = float(cost.get("flops", float("nan"))) / SLICES_PER_VOLUME
    peak_tflops = float(os.environ.get("SWEEP_PEAK_TFLOPS", 197.0))
    print(f"FLOPs/slice (XLA path): {flops_per_slice / 1e9:.2f} G;"
          f" MFU denominator {peak_tflops:.0f} TFLOP/s bf16", flush=True)

    rows = []
    for point in points:
        mode, _, ipp = point.partition(":")
        mode, _, flags = mode.partition("+")
        flagset = set(flags.split(".")) - {""}
        os.environ["RDST_TPU_PALLAS"] = mode
        quant = ",".join(sorted(flagset))
        if quant:  # int8 groups (e.g. qkv,mlp)
            os.environ["RDST_TPU_PALLAS_QUANT"] = quant
        else:
            os.environ.pop("RDST_TPU_PALLAS_QUANT", None)
        if ipp:  # unannotated points use each kernel's own default
            os.environ["RDST_TPU_PALLAS_IPP"] = ipp
        else:
            os.environ.pop("RDST_TPU_PALLAS_IPP", None)

        # kernel wrappers read some variant env vars at trace time; their
        # jit caches would otherwise serve stale executables across points
        from rdst_tpu.kernels import rdstb_block, swin_block

        swin_block.fused_swin_block.clear_cache()
        swin_block.fused_swin_pair.clear_cache()
        rdstb_block.fused_rdstb.clear_cache()

        def eva_volume(p, hr):
            lr = resize_nhwc(hr, LR_SHAPE[:2], "cubic").astype(dtype)
            sr = model.apply(p, lr).astype(jnp.float32)
            m = 4
            return jax_metrics.psnr(jax_metrics.crop_margin(hr, m),
                                    jax_metrics.crop_margin(sr, m))

        def eva_sweep(p, vols):
            def body(i, acc):
                hr = vols[jax.lax.rem(i, N_DISTINCT_VOLUMES)]
                return acc.at[i].set(eva_volume(p, hr))

            return jax.lax.fori_loop(
                0, N_ITERS, body, jnp.zeros((N_ITERS, SLICES_PER_VOLUME)))

        sweep = jax.jit(eva_sweep)  # fresh identity per point
        try:
            jax.device_get(sweep(params, volumes))  # compile + first exec
            t0 = time.time()
            psnr_v = jax.device_get(sweep(params, volumes))
            dt_s = time.time() - t0
            sps = N_ITERS * SLICES_PER_VOLUME / dt_s
            # bf16-vs-f32 agreement on one volume through this mode
            out = np.asarray(
                jax.jit(model.apply)(params, lr0.astype(dtype)), np.float32)
            mse = float(np.mean((out - ref32) ** 2))
            agree_db = 10 * np.log10(
                float(np.square(ref32.max() - ref32.min())) / max(mse, 1e-30))
            ok = np.isfinite(psnr_v).all()
            mfu = sps * flops_per_slice / (peak_tflops * 1e12)
            rows.append((point, sps, mfu, agree_db, ok))
            print(f"{point:14s} {sps:9.1f} slices/s  MFU {mfu:6.2%}"
                  f"  agree {agree_db:5.1f} dB  finite={bool(ok)}", flush=True)
        except Exception as e:  # keep sweeping past a broken point
            rows.append((point, float("nan"), float("nan"), float("nan"),
                         False))
            print(f"{point:14s} FAILED: {type(e).__name__}: {e}", flush=True)

    print("\nmode            slices/s     MFU    agreement")
    for point, sps, mfu, agree, ok in rows:
        print(f"{point:14s} {sps:9.1f}  {mfu:6.2%}   {agree:5.1f} dB"
              f" {'' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
