#!/usr/bin/env python
"""Headline benchmark: OASIS x4 RDST-E1 inference throughput (slices/sec/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "slices/sec/chip", "vs_baseline": N}

Methodology
-----------
* Full RDST-E1 (8 RDSTB, embed 60 — the shipped config) on real OASIS
  slice geometry: LR 40x32 -> HR 160x128 (scale 4).
* The HBM-resident evaluation pipeline: HR volumes live in HBM; ONE
  jitted program sweeps N_ITERS whole-volume evaluations with
  lax.fori_loop — per volume: on-device bicubic LR synthesis
  (cv2-parity), SR forward, PSNR scoring with the reference margin rule
  — and the per-slice metric array is fetched once. Timed: the second
  sweep's dispatch + execution + fetch. A single-dispatch in-graph loop
  is the only honest timing through the dev harness's axon tunnel:
  block_until_ready does NOT actually fence there, and each jit call
  carries ~0.35 s tunnel overhead, so multi-dispatch timings measure the
  tunnel rather than the chip.
* bfloat16 activations (params f32) — the production inference path,
  measured at 64 dB output agreement vs the f32 reference (PSNR impact
  « 0.01 dB; parity evaluation uses f32 + HIGHEST matmul precision).
  Override with RDST_TPU_BENCH_DTYPE=float32.

vs_baseline
-----------
BASELINE.json's target is ">= 4x A100 throughput at PSNR parity" with no
published A100 number. Denominator pinned to a principled estimate:
RDST-E1 at 40x32 is ~15 GFLOPs/slice; an A100 at a generous 30% MFU on
TF32 (156 TFLOPs peak) sustains ~3.1k slices/s => 4x target = 12,500
slices/s. vs_baseline = measured / 12_500 (>1.0 beats the target).

Multi-device mode (VERDICT r3 ask #2)
-------------------------------------
The same script runs unchanged on a pod: KEY=VALUE overrides select the
mesh (``python bench.py mesh_shape=[8]`` or any config-file
mesh_shape/mesh_axes), slices shard over the 'data' axis, the fused
kernels stay data-local via shard_map (parallel.mesh registry), and the
output carries BOTH ``value`` (slices/sec/chip — the per-chip headline,
comparable across mesh sizes) and ``aggregate_slices_per_sec`` with
``n_devices``. vs_baseline stays per-chip. Virtual-mesh scaling
evidence (1/2/4/8 devices, collective audit): tools/scaling_bench.py +
docs/SCALING.md.
"""

import json
import os
import threading
import time

import numpy as np

TARGET_SLICES_PER_SEC = 12_500.0  # 4x estimated A100 throughput (see docstring)
# Hard wall-clock cap: the axon tunnel has been observed to die with the
# host blocked forever inside device init / a fetch (PERF.md "Reliability
# on the dev tunnel"). The driver needs ONE json line either way, so a
# watchdog emits an explicit error record and hard-exits rather than
# hanging. Generous default: first compile + first execution through the
# tunnel legitimately costs several minutes.
DEADLINE_S = float(os.environ.get("RDST_TPU_BENCH_DEADLINE_S", 1800))
SLICES_PER_VOLUME = 128  # OASIS brain volumes have ~100-170 usable slices
LR_SHAPE = (40, 32, 1)
N_DISTINCT_VOLUMES = 2
N_ITERS = 16  # whole-volume evaluations per sweep (2,048 slices)


def _arm_watchdog():
    done = threading.Event()

    def expire():
        if done.wait(DEADLINE_S):
            return
        print(json.dumps({
            "metric": "OASIS x4 RDST-E1 inference throughput"
                      " (SR + on-device PSNR)",
            "value": 0.0,
            "unit": "slices/sec/chip",
            "vs_baseline": 0.0,
            "error": f"no result within {DEADLINE_S:.0f}s — device "
                     "unreachable or wedged (tunnel relay down?); see "
                     "PERF.md 'Reliability on the dev tunnel'",
        }), flush=True)
        os._exit(2)

    threading.Thread(target=expire, daemon=True).start()
    return done


def main():
    done = _arm_watchdog()
    import sys

    import jax
    import jax.numpy as jnp

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data.ops_jax import resize_nhwc
    from rdst_tpu.metrics import jax_metrics
    from rdst_tpu.models import build_generator

    dtype = jnp.bfloat16
    if os.environ.get("RDST_TPU_BENCH_DTYPE") == "float32":
        dtype = jnp.float32

    paras = ParametersLoader("config_files/rdst_e1_oasis_x4.ini")
    paras.apply_overrides(sys.argv[1:])  # e.g. mesh_shape=[8] on a pod
    # mesh FIRST: the kernel wrappers read the registry at trace time
    # (shard_map data-locality — parallel.mesh.set_active_mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rdst_tpu.parallel import make_mesh_from_paras

    mesh = make_mesh_from_paras(paras)
    n_data = mesh.shape.get("data", 1)
    assert SLICES_PER_VOLUME % n_data == 0, (
        f"data axis {n_data} must divide {SLICES_PER_VOLUME} slices")

    from rdst_tpu.kernels.window_attention import export_kernel_flags

    export_kernel_flags(paras)  # pallas_kernels/quant/softmax config keys
    model = build_generator(paras, dtype=dtype)

    rng = np.random.default_rng(0)
    hr_shape = (SLICES_PER_VOLUME, LR_SHAPE[0] * 4, LR_SHAPE[1] * 4, 1)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1,) + LR_SHAPE))
    softmax_variant = os.environ.get("RDST_TPU_PALLAS_SOFTMAX", "stable")
    if softmax_variant == "auto":
        # self-audit: measure THIS param set's actual logit bound and
        # resolve clamp-vs-stable before the timed trace (the bench's
        # fresh-init logits are tiny, so auto legitimately recovers the
        # clamp-path throughput; a loaded 100k-style checkpoint would
        # resolve stable via its sidecar stamp — same policy everywhere)
        from rdst_tpu.kernels.logit_audit import measure_logit_bound
        from rdst_tpu.kernels.swin_block import resolve_softmax_auto

        xa = jnp.asarray(rng.random((4,) + LR_SHAPE, dtype=np.float32))
        bound = measure_logit_bound(model, params, xa)
        softmax_variant = resolve_softmax_auto(bound)
        os.environ["RDST_TPU_PALLAS_SOFTMAX"] = softmax_variant
    # data loading (untimed): HR volumes resident in HBM, slices sharded
    # over the 'data' mesh axis (no-op on one chip; on a pod each chip
    # evaluates its slice shard and GSPMD keeps everything local)
    volumes = jax.device_put(
        rng.random((N_DISTINCT_VOLUMES,) + hr_shape, dtype=np.float32),
        NamedSharding(mesh, P(None, "data")))

    def eva_volume(p, hr):
        lr = resize_nhwc(hr, LR_SHAPE[:2], "cubic").astype(dtype)
        sr = model.apply(p, lr).astype(jnp.float32)
        m = 4  # margin rule: int(ceil(scale)) px (sr_metrics.py:54-63)
        return jax_metrics.psnr(jax_metrics.crop_margin(hr, m),
                                jax_metrics.crop_margin(sr, m))

    @jax.jit
    def eva_sweep(p, vols):
        def body(i, acc):
            hr = vols[jax.lax.rem(i, N_DISTINCT_VOLUMES)]
            return acc.at[i].set(eva_volume(p, hr))

        return jax.lax.fori_loop(
            0, N_ITERS, body, jnp.zeros((N_ITERS, SLICES_PER_VOLUME)))

    # warmup: compile + the tunnel's one-time first-execution overhead
    jax.device_get(eva_sweep(params, volumes))

    t0 = time.time()
    psnr_v = jax.device_get(eva_sweep(params, volumes))
    elapsed = time.time() - t0
    assert psnr_v.shape == (N_ITERS, SLICES_PER_VOLUME)
    assert np.isfinite(psnr_v).all()

    aggregate = N_ITERS * SLICES_PER_VOLUME / elapsed
    per_chip = aggregate / n_data
    done.set()
    rec = {
        "metric": "OASIS x4 RDST-E1 inference throughput (SR + on-device PSNR)",
        "value": round(per_chip, 1),
        "unit": "slices/sec/chip",
        "vs_baseline": round(per_chip / TARGET_SLICES_PER_SEC, 3),
        "platform": jax.default_backend(),
        "pallas_softmax": softmax_variant or "stable",
    }
    if n_data > 1:  # multi-device mode: aggregate alongside per-chip
        rec["n_devices"] = n_data
        rec["mesh_shape"] = dict(mesh.shape)
        rec["aggregate_slices_per_sec"] = round(aggregate, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
