#!/usr/bin/env bash
# The pending hardware queue for the next TPU window (the axon tunnel
# died mid-round; see PERF.md "Reliability on the dev tunnel").
# Runs every queued training/benchmark job sequentially with logs under
# /tmp/tpuq_*; result tables in README/PERF are filled in manually from
# the logs afterwards.
#
#   nohup tools/tpu_queue.sh > /tmp/tpuq_driver.log 2>&1 &
#
# Each step is individually time-bounded; a failed step logs and moves
# on (later steps don't depend on earlier ones).
set -u
cd "$(dirname "$0")/.."

step() {
  # stdout is the driver log (see usage above) — echo, don't tee: a
  # second append fd on the same file interleaves/garbles offsets
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] $name"
  "$@" > "/tmp/tpuq_${name}.log" 2>&1
  local rc=$?  # BEFORE any $(...) — command substitution resets $?
  echo "=== [$(date -u +%H:%M:%S)] $name exit=$rc"
}

# 0. Compile-only (cheap, first): does per-RDSTB remat cut the
#    flagship train step's HBM temp bytes on the TPU backend? Decides
#    whether the flagship config ships rdst_remat=True (the CPU
#    scheduler shows ~no effect; HBM is the question).
step remat_memcheck timeout 1800 python tools/remat_memcheck.py

# 1. COVID 10k retrain on the regenerated (noise-floored) example8
#    corpus, supervised restart-on-stall; then eval the best snapshot.
#    Bicubic baseline on this corpus: 31.13/0.902.
step covid_train timeout 10800 tools/supervise.sh \
  --config-file config_files/rdst_e1_10k_covid8_x4.ini \
  stall_warn_s=300 stall_abort_s=900
step covid_eval timeout 3600 python test.py \
  --config-file config_files/rdst_e1_10k_covid8_x4.ini --gpu-id -1 \
  "well_trained_single_scale_model_g='outputs/RDST_E1_10K_COVID8_None/models/WarmUP_model_g_best.msgpack'" \
  "model_name='RDST_COVID8_BEST'"

# 2. W96 kernel-mode sweep (fills the README W96 slices/s cell and the
#    int8 C=96 midpoint), then bench_all record 7 (W96 inference).
step w96_sweep timeout 5400 python tools/kernel_sweep.py \
  --config=config_files/rdst_w96_40k_oasis20_x4.ini 0 swin pair rdstb \
  rdstb+qkv rdstb+all
step bench7 timeout 3600 python tools/bench_all.py --skip 1 2 3 4 5 6 8 9

# 3. bf16 train-step records: XLA autodiff vs differentiable pair
#    kernel (PERF.md "Differentiable fused kernels" pending numbers);
#    plus re-record 6 — swinir_std now SHIPS pallas_kernels='swin' +
#    pallas_quant='qkv' and bench_inference honors the config keys.
step bench689 timeout 7200 python tools/bench_all.py --skip 1 2 3 4 5 7

# 4. MetaSR 20k (scale-free training), then multi-scale test.
step metasr_train timeout 14400 tools/supervise.sh \
  --config-file config_files/metasr_20k_oasis20_x4.ini \
  stall_warn_s=300 stall_abort_s=900
step metasr_eval timeout 7200 python test.py \
  --config-file config_files/metasr_20k_oasis20_x4.ini --gpu-id -1 \
  "well_trained_single_scale_model_g='outputs/METASR_20K_O20_None/models/WarmUP_model_g_best.msgpack'" \
  "model_name='METASR_20K_BEST'"

# 5. GAN fine-tune 5k from the flagship weights, then eval.
step ganft_train timeout 10800 tools/supervise.sh \
  --config-file config_files/rdst_gan_ft_oasis20_x4.ini \
  stall_warn_s=300 stall_abort_s=900
step ganft_eval timeout 3600 python test.py \
  --config-file config_files/rdst_gan_ft_oasis20_x4.ini --gpu-id -1 \
  "well_trained_single_scale_model_g='outputs/RDST_GAN_FT_O20_None/models/GAN-FT_model_g_best.msgpack'" \
  "model_name='RDST_GANFT_BEST'"

# 6. headline sanity before round end
step bench_final timeout 3600 python bench.py

echo "=== [$(date -u +%H:%M:%S)] queue complete"
