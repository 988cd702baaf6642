#!/usr/bin/env python
"""Multi-config benchmark (BASELINE.json configs 1-5 + extras) on the
real TPU.

Extends bench.py's single-line headline with one JSON record per
config, written to BENCH_EXTRA.json (and echoed line by line):

1. RDST-E1 x4 inference         (bench.py methodology, bf16 + kernels)
2. SwinIR-lightweight x4        (same harness, swinir generator)
3. RDN x4 (CNN baseline)        (dense-conv path, XLA)
4. RDST-E1 training steps/s     (a) chip-paced: in-graph lax.scan of the
   jitted train step over a resident batch — measures the DEVICE;
   (b) dispatch-paced: host loop like train.py — measures what this
   dev tunnel actually sustains (see PERF.md methodology cautions).
   Plus the compiled cost model (FLOPs + HBM bytes) per step so pod
   users can extrapolate.
5. RDST-HRL seg fine-tune step  (L1 + UNet-F loss, warm-started G,
   the o20-split config — matches the README comparison table)
6. extra: SwinIR-standard x4 inference (11.9M params, C=180 — not a
   BASELINE config; the 38%-params comparison's big model)
7. extra: RDST-W96 x4 inference (11.28M params — the capacity-matched
   RDST from the equal-capacity comparison)
8. extra: flagship L1 train step, bf16 activations, XLA autodiff
9. extra: same step through the differentiable fused DSTL-pair
   kernels (pallas_train='pair', kernels/pair_train.py)

All inference points share bench.py's timing discipline: HBM-resident
volumes, ONE jitted fori_loop sweep per measurement, one device_get.

Usage: python tools/bench_all.py [--out BENCH_EXTRA.json] [--skip N ...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLICES_PER_VOLUME = 128
LR_SHAPE = (40, 32, 1)
N_DISTINCT_VOLUMES = 2
N_ITERS = 16


def _sweep_throughput(model, params, volumes, dtype):
    """bench.py's fori_loop sweep; returns slices/s."""
    import jax
    import jax.numpy as jnp

    from rdst_tpu.data.ops_jax import resize_nhwc
    from rdst_tpu.metrics import jax_metrics

    def eva_volume(p, hr):
        lr = resize_nhwc(hr, LR_SHAPE[:2], "cubic").astype(dtype)
        sr = model.apply(p, lr).astype(jnp.float32)
        return jax_metrics.psnr(jax_metrics.crop_margin(hr, 4),
                                jax_metrics.crop_margin(sr, 4))

    @jax.jit
    def eva_sweep(p, vols):
        def body(i, acc):
            hr = vols[jax.lax.rem(i, N_DISTINCT_VOLUMES)]
            return acc.at[i].set(eva_volume(p, hr))

        return jax.lax.fori_loop(
            0, N_ITERS, body, jnp.zeros((N_ITERS, SLICES_PER_VOLUME)))

    jax.device_get(eva_sweep(params, volumes))  # compile + first exec
    t0 = time.time()
    psnr_v = jax.device_get(eva_sweep(params, volumes))
    dt = time.time() - t0
    assert np.isfinite(psnr_v).all()
    return N_ITERS * SLICES_PER_VOLUME / dt


def bench_inference(config_name, gen, extra=None,
                    config_file="config_files/rdst_e1_oasis_x4.ini"):
    import jax
    import jax.numpy as jnp

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.models import build_generator

    paras = ParametersLoader(config_file)
    paras.set("feature_generator", gen)
    for k, v in (extra or {}).items():
        paras.set(k, v)
    # measure the SHIPPED kernel config: reset the trace-time gates to
    # defaults, then export this config's pallas_kernels/pallas_quant
    # (absent keys leave defaults; prevents cross-record inheritance —
    # e.g. swinir_std ships int8 qkv, the next record must not)
    from rdst_tpu.kernels.window_attention import export_kernel_flags

    os.environ.pop("RDST_TPU_PALLAS", None)
    os.environ.pop("RDST_TPU_PALLAS_QUANT", None)
    export_kernel_flags(paras)
    # quant is keyed into the wrapper jit caches, but PRECISE/budget
    # trace-time reads are not — drop everything between records
    from rdst_tpu.kernels import clear_kernel_caches

    clear_kernel_caches()
    dtype = jnp.bfloat16
    model = build_generator(paras, dtype=dtype)
    rng = np.random.default_rng(0)
    hr_shape = (SLICES_PER_VOLUME, LR_SHAPE[0] * 4, LR_SHAPE[1] * 4, 1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1,) + LR_SHAPE))
    volumes = jax.device_put(
        rng.random((N_DISTINCT_VOLUMES,) + hr_shape, dtype=np.float32))
    from rdst_tpu.utils.flops import count_params

    sps = _sweep_throughput(model, params, volumes, dtype)
    return {
        "config": config_name,
        "metric": f"{gen} OASIS x4 inference throughput",
        "value": round(sps, 1),
        "unit": "slices/sec/chip",
        "params_m": round(count_params(params) / 1e6, 3),
        "dtype": "bfloat16",
    }


def bench_training(config_name, config_file, seg_loss=False, steps=64,
                   extra=None):
    """Train-step throughput: chip-paced (in-graph scan) and
    dispatch-paced (host loop), plus the compiled step cost model."""
    import jax
    import jax.numpy as jnp

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.runners.trainer import SRTrainer
    from rdst_tpu.data.readers import make_train_valid_datasets

    # the trainer exports `pallas_train` to the env for the trace-time
    # gate; clear it here so earlier records can't leak into this one
    os.environ.pop("RDST_TPU_PALLAS_TRAIN", None)

    paras = ParametersLoader(config_file)
    paras.set("check_every", 10**9)  # no eval inside the bench
    for k, v in (extra or {}).items():
        paras.set(k, v)
    ds_train, ds_valid = make_train_valid_datasets(paras, seg_loss=seg_loss)
    trainer = SRTrainer(paras, ds_train, ds_valid, seed=0)
    trainer.setup()

    ts = trainer.training_states[0]
    trainer.loss.set_training_state(ts)
    step_fn = trainer._make_train_step(ts)
    rng = np.random.default_rng(0)
    batch = ds_train.sample(rng)
    host_batch = {"in": batch["in"], "out": batch["out"]}
    if "seg_gt" in batch:
        host_batch["seg_gt"] = batch["seg_gt"]
    from rdst_tpu.parallel import shard_batch

    device_batch = shard_batch(trainer.mesh, host_batch)
    sr_factor = float(batch["sr_factor"])
    params, opt_state = trainer.state.params, trainer.state.opt_state

    # (a) chip-paced: scan the step body in ONE dispatch. The batch is
    # constant across iterations (compute is identical; only the data
    # differs in real training), donate nothing so params stay reusable.
    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def scan_steps(params, opt_state, batch, n):
        def body(carry, rng_i):
            p, o = carry
            (total, report), grads = jax.value_and_grad(
                lambda pp: _loss_only(pp, batch), has_aux=True)(p)
            updates, o2 = trainer.tx.update(grads, o, p)
            p2 = jax.tree.map(lambda a, b: a + b, p, updates)
            return (p2, o2), total

        def _loss_only(p, b):
            pred = trainer.model.apply(
                p, b["in"], sr_factor, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0),
                      "droppath": jax.random.PRNGKey(1)})
            return trainer.loss(pred.astype(jnp.float32), b, ts,
                                adv_state=None)

        (p, o), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n))
        return losses

    losses = jax.device_get(scan_steps(params, opt_state, device_batch, steps))
    t0 = time.time()
    losses = jax.device_get(scan_steps(params, opt_state, device_batch, steps))
    chip_sps = steps / (time.time() - t0)
    assert np.isfinite(losses).all()

    # (b) dispatch-paced host loop (what train.py pays on this tunnel)
    jrng = jax.random.PRNGKey(0)
    p, o = params, opt_state
    outs = []
    for i in range(8):  # warm the step cache
        jrng, srng = jax.random.split(jrng)
        p, o, total, report, ok = step_fn(p, o, device_batch, srng, sr_factor)
    t0 = time.time()
    for i in range(steps):
        jrng, srng = jax.random.split(jrng)
        p, o, total, report, ok = step_fn(p, o, device_batch, srng, sr_factor)
        outs.append(total)
    jax.device_get(outs[-1])
    host_sps = steps / (time.time() - t0)

    # compiled cost model of ONE step (the step_fn executable)
    lowered = step_fn.lower(params, opt_state, device_batch,
                            jax.random.PRNGKey(0), sr_factor)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "config": config_name,
        "metric": "train-step throughput",
        "batch_size": int(batch["in"].shape[0]),
        "training_dtype": jnp.dtype(trainer.training_dtype).name,
        "pallas_train": os.environ.get("RDST_TPU_PALLAS_TRAIN", ""),
        "value": round(chip_sps, 2),
        "unit": "steps/sec (chip-paced, in-graph scan)",
        "dispatch_paced_steps_per_sec": round(host_sps, 2),
        "dispatch_caveat": "host loop through the axon dev tunnel "
                           "(~0.35s/dispatch RPC pipelined); chip-paced "
                           "number is the device capability",
        "compiled_flops_per_step": float(cost.get("flops", float("nan"))),
        "compiled_hbm_bytes_per_step": float(
            cost.get("bytes accessed", float("nan"))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_EXTRA.json")
    ap.add_argument("--skip", nargs="*", type=int, default=[],
                    help="record numbers to skip (1-5 BASELINE, 6-11 extra); "
                         "skipped records keep their previous value when "
                         "the out file already exists")
    args = ap.parse_args()

    # load the previous out file BEFORE spending TPU time: a corrupt or
    # old-format file must fail now, not after minutes of benching
    old = {}
    if args.skip and os.path.exists(args.out):
        with open(args.out) as f:
            old = {r["baseline_config"]: r
                   for r in json.load(f)["records"] if "baseline_config" in r}

    records = []

    def run(n, fn, *a, **k):
        if n in args.skip:
            return
        try:
            rec = fn(*a, **k)
        except Exception as e:  # record failures instead of dying
            rec = {"config": f"baseline-{n}", "error": f"{type(e).__name__}: {e}"}
        rec["baseline_config"] = n
        records.append(rec)
        print(json.dumps(rec), flush=True)

    run(1, bench_inference, "baseline-1-rdst-e1", "rdst")
    run(2, bench_inference, "baseline-2-swinir-light", "swinir")
    run(3, bench_inference, "baseline-3-rdn", "rdn")
    run(4, bench_training, "baseline-4-rdst-e1-l1-train",
        "config_files/rdst_e1_40k_oasis20_x4.ini")
    # the o20 variant is the documented config-5 experiment (README table)
    run(5, bench_training, "baseline-5-rdst-hrl-seg-finetune",
        "config_files/rdst_hrl_seg_ft_oasis20_x4.ini", seg_loss=True,
        steps=16)
    # extra (not a BASELINE config): SwinIR-standard, the 38%-params
    # comparison's big model — C=180, where int8 qkv wins (PERF.md)
    run(6, bench_inference, "extra-6-swinir-std", "swinir",
        config_file="config_files/swinir_std_40k_oasis20_x4.ini")
    # extra: RDST-W96, the capacity-matched RDST (11.28M ~ SwinIR-std's
    # 11.90M) from the equal-capacity comparison (README table)
    run(7, bench_inference, "extra-7-rdst-w96", "rdst",
        config_file="config_files/rdst_w96_40k_oasis20_x4.ini")
    # extras 8/9: the flagship L1 train step in bf16, XLA autodiff vs
    # the differentiable fused DSTL-pair kernels (kernels/pair_train.py)
    # — same chip-paced methodology as record 4 (its f32-XLA baseline)
    run(8, bench_training, "extra-8-rdst-e1-train-bf16-xla",
        "config_files/rdst_e1_40k_oasis20_x4.ini",
        extra={"training_dtype": "bfloat16"})
    run(9, bench_training, "extra-9-rdst-e1-train-bf16-pairkernel",
        "config_files/rdst_e1_40k_oasis20_x4.ini",
        extra={"training_dtype": "bfloat16", "pallas_train": "pair"})
    # extras 10/11 (r5): SwinIR-std's bf16 train step — the C=180
    # geometry whose PAIR backward exceeds VMEM (it burned its r4 100k
    # run at XLA pace, VERDICT r4 #6). Record 11 engages the
    # single-block window-chunked train kernel (kernels/block_train.py)
    # through the default 'pair' mode's per-block fallback.
    run(10, bench_training, "extra-10-swinir-std-train-bf16-xla",
        "config_files/swinir_std_40k_oasis20_x4.ini",
        extra={"training_dtype": "bfloat16", "pallas_train": "off"},
        steps=32)
    run(11, bench_training, "extra-11-swinir-std-train-bf16-blockkernel",
        "config_files/swinir_std_40k_oasis20_x4.ini",
        extra={"training_dtype": "bfloat16", "pallas_train": "pair"},
        steps=32)

    # --skip'd configs keep their previous record when the out file exists
    kept = [old[n] for n in sorted(old) if n in args.skip]
    records = sorted(kept + records, key=lambda r: r["baseline_config"])

    with open(args.out, "w") as f:
        json.dump({"records": records}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
