#!/usr/bin/env bash
# Follow-up hardware queue: steps from tpu_queue.sh that failed because
# the synthetic data fixtures had been wiped (now regenerated), plus the
# remat speed decision measurement. Run AFTER tpu_queue.sh completes.
#
#   nohup tools/tpu_queue2.sh > /tmp/tpuq2_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

step() {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] $name"
  "$@" > "/tmp/tpuq2_${name}.log" 2>&1
  local rc=$?
  echo "=== [$(date -u +%H:%M:%S)] $name exit=$rc"
}

# 1. remat on/off chip-paced steps/s (decides rdst_remat shipping)
step remat_speed timeout 3600 python tools/remat_speedcheck.py

# 2. COVID 10k retrain on the regenerated noise-floored example8 corpus
step covid_train timeout 10800 tools/supervise.sh \
  --config-file config_files/rdst_e1_10k_covid8_x4.ini \
  stall_warn_s=300 stall_abort_s=900
step covid_eval timeout 3600 python test.py \
  --config-file config_files/rdst_e1_10k_covid8_x4.ini --gpu-id -1 \
  "well_trained_single_scale_model_g='outputs/RDST_E1_10K_COVID8_None/models/WarmUP_model_g_best.msgpack'" \
  "model_name='RDST_COVID8_BEST'"

echo "=== [$(date -u +%H:%M:%S)] queue2 complete"
