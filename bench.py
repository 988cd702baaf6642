#!/usr/bin/env python
"""Headline benchmark: OASIS x4 RDST-E1 inference throughput (slices/sec/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "slices/sec/chip", "vs_baseline": N}

Methodology
-----------
* Full RDST-E1 (8 RDSTB, embed 60 — the shipped config) on real OASIS
  slice geometry: LR 40x32 -> HR 160x128 (160x128 margin-cropped slices
  at scale 4, per the reference example config).
* The HBM-resident evaluation pipeline (the framework's production eval
  path): HR volumes live in HBM; per volume, one jitted program
  synthesizes LR on device (cv2-parity bicubic), runs SR, and scores
  PSNR/SSIM with the reference margin rule. Per-slice metric arrays
  stay on device and are fetched once after the run. Timed: all
  dispatches + completion + the single metric fetch. (The dev-harness
  tunnel charges ~0.35 s per dispatch RPC and moves ~15 MB/s
  host<->device, which bounds what any framework can show here;
  image readbacks inside the loop would benchmark the tunnel alone.)
* Default (bf16) MXU matmul precision — the production inference path
  (66 dB output agreement vs the f32 reference, far above the ~26-33 dB
  PSNR signal band; parity evaluation uses HIGHEST precision).

vs_baseline
-----------
BASELINE.json's target is ">= 4x A100 throughput at PSNR parity" with no
published A100 number. Denominator pinned to a principled estimate:
RDST-E1 at 40x32 is ~15 GFLOPs/slice; an A100 at a generous 30% MFU on
TF32 (156 TFLOPs peak) sustains ~3.1k slices/s => 4x target = 12,500
slices/s. vs_baseline = measured / 12_500 (>1.0 beats the target).
"""

import json
import time

import numpy as np

TARGET_SLICES_PER_SEC = 12_500.0  # 4x estimated A100 throughput (see docstring)
SLICES_PER_VOLUME = 128  # OASIS brain volumes have ~100-170 usable slices
LR_SHAPE = (40, 32, 1)
N_DISTINCT_VOLUMES = 4
N_VOLUMES_WARMUP = 2
N_VOLUMES_MEASURE = 64


def main():
    import jax
    import jax.numpy as jnp

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.data.ops_jax import resize_nhwc
    from rdst_tpu.metrics import jax_metrics
    from rdst_tpu.models import build_generator

    paras = ParametersLoader("config_files/rdst_e1_oasis_x4.ini")
    model = build_generator(paras)

    rng = np.random.default_rng(0)
    hr_shape = (SLICES_PER_VOLUME, LR_SHAPE[0] * 4, LR_SHAPE[1] * 4, 1)

    init = jax.jit(model.init)  # eager init over the dev tunnel is ~100x slower
    params = init(jax.random.PRNGKey(0), jnp.zeros((1,) + LR_SHAPE))
    # data loading (untimed): distinct HR volumes resident in HBM
    volumes = jnp.asarray(
        rng.random((N_DISTINCT_VOLUMES,) + hr_shape, dtype=np.float32))
    volumes = [volumes[i] for i in range(N_DISTINCT_VOLUMES)]
    jax.block_until_ready(volumes)

    @jax.jit
    def eva_volume(p, hr):
        lr = resize_nhwc(hr, LR_SHAPE[:2], "cubic")  # on-device LR synthesis
        sr = model.apply(p, lr)
        m = 4  # margin rule: int(ceil(scale)) px (sr_metrics.py:54-63)
        sr_c = jax_metrics.crop_margin(sr, m)
        gt_c = jax_metrics.crop_margin(hr, m)
        return jax_metrics.psnr(gt_c, sr_c), jax_metrics.ssim(gt_c, sr_c)

    # warmup: compile + one-time tunnel transfer setup
    for i in range(N_VOLUMES_WARMUP):
        jax.device_get(eva_volume(params, volumes[i % N_DISTINCT_VOLUMES]))

    t0 = time.time()
    psnrs, ssims = [], []
    for i in range(N_VOLUMES_MEASURE):
        pv, sv = eva_volume(params, volumes[i % N_DISTINCT_VOLUMES])
        psnrs.append(pv)
        ssims.append(sv)
    # one fetch for the whole run: all executions must have completed
    psnr_v = np.asarray(jnp.stack(psnrs))
    ssim_v = np.asarray(jnp.stack(ssims))
    elapsed = time.time() - t0
    assert psnr_v.shape == (N_VOLUMES_MEASURE, SLICES_PER_VOLUME)
    assert np.isfinite(psnr_v).all() and np.isfinite(ssim_v).all()

    slices_per_sec = N_VOLUMES_MEASURE * SLICES_PER_VOLUME / elapsed
    print(json.dumps({
        "metric": "OASIS x4 RDST-E1 inference throughput (SR + on-device PSNR/SSIM)",
        "value": round(slices_per_sec, 1),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / TARGET_SLICES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
