#!/bin/bash
# Round-3 TPU work queue: everything that was blocked on the dead axon
# tunnel, in priority order. Run from the repo root once the tunnel is
# back (tools/ watchdog or `python -c "import jax; jax.devices()"`).
#
# Each step logs to /tmp and appends PASS/FAIL to /tmp/queue_status.log;
# a failing step does not stop later steps. Evaluations run on CPU
# (--gpu-id -1): deterministic, tunnel-independent, and the quality
# numbers are device-independent.
set -u
cd "$(dirname "$0")/.."
S=/tmp/queue_status.log
note() { echo "$(date -u '+%H:%M:%S') $*" | tee -a "$S"; }
step() { # step <name> <logfile> <cmd...>
  local name=$1 log=$2; shift 2
  note "START $name"
  if "$@" > "$log" 2>&1; then note "PASS  $name ($log)"; else
    note "FAIL  $name rc=$? ($log)"; fi
}

# 1. COVID-CT 10k retrain on the regenerated example8 corpus, then eval
#    the best snapshot (fills the README cross-dataset COVID row;
#    bicubic on this corpus = 31.13 dB / 0.902).
step covid8-train /tmp/train_10k_covid8_v4.log \
  timeout 10800 tools/supervise.sh \
  --config-file config_files/rdst_e1_10k_covid8_x4.ini \
  stall_warn_s=300 stall_abort_s=900
step covid8-eval /tmp/test_covid8_best.log \
  timeout 3600 python test.py \
  --config-file config_files/rdst_e1_10k_covid8_x4.ini --gpu-id -1 \
  'well_trained_single_scale_model_g="./outputs/RDST_E1_10K_COVID8_None/models/WarmUP_model_g_best.msgpack"' \
  'model_name="RDST_COVID8_BEST"'

# 2. W96 kernel sweep (README W96 slices/s cell + the C=96 int8
#    midpoint for PERF.md), then the one missing bench_all record.
step w96-sweep /tmp/sweep_w96.log \
  timeout 5400 python tools/kernel_sweep.py \
  --config=config_files/rdst_w96_40k_oasis20_x4.ini \
  0 swin pair rdstb rdstb+qkv rdstb+all
step bench-all-7 /tmp/bench_all_7.log \
  timeout 5400 python tools/bench_all.py --skip 1 2 3 4 5 6

# 3. Meta-SR 20k scale-free training + multi-scale eval (README
#    arbitrary-scale workflow row + weights asset).
step metasr-train /tmp/train_metasr20k.log \
  timeout 14400 tools/supervise.sh \
  --config-file config_files/metasr_20k_oasis20_x4.ini \
  stall_warn_s=300 stall_abort_s=900
step metasr-eval /tmp/test_metasr_best.log \
  timeout 3600 python test.py \
  --config-file config_files/metasr_20k_oasis20_x4.ini --gpu-id -1 \
  'well_trained_model_metasr="./outputs/METASR_20K_O20_None/models/WarmUP_model_g_best.msgpack"' \
  'model_name="METASR_O20_BEST"' 'test_sr_scales=[1.5, 2.0, 3.0, 4.0]'

# 4. GAN fine-tune (5k from the 40k L1 asset via pre_trained_g) + eval.
step ganft-train /tmp/train_ganft5k.log \
  timeout 10800 tools/supervise.sh \
  --config-file config_files/rdst_gan_ft_oasis20_x4.ini \
  stall_warn_s=300 stall_abort_s=900
step ganft-eval /tmp/test_ganft_best.log \
  timeout 3600 python test.py \
  --config-file config_files/rdst_gan_ft_oasis20_x4.ini --gpu-id -1 \
  'well_trained_single_scale_model_g="./outputs/RDST_GAN_FT_O20_None/models/GAN-FT_model_g_best.msgpack"' \
  'model_name="RDST_GANFT_BEST"'

# 5. Headline bench sanity before round end.
step bench /tmp/bench_final.log timeout 2400 python bench.py

note "QUEUE DONE"
