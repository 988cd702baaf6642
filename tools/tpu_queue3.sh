#!/usr/bin/env bash
# Session queue for the current TPU window (~1h): the pending
# measurements in strict value order, each time-bounded so later steps
# still run. Logs under /tmp/tpuq3_*.
#
#   nohup tools/tpu_queue3.sh > /tmp/tpuq3_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

step() {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] $name"
  "$@" > "/tmp/tpuq3_${name}.log" 2>&1
  local rc=$?
  echo "=== [$(date -u +%H:%M:%S)] $name exit=$rc"
}

# 1. The headline pending decision: bf16 flagship train step, XLA
#    autodiff vs the differentiable fused DSTL-pair kernel (records 8/9).
step bench89 timeout 2400 python tools/bench_all.py --skip 1 2 3 4 5 6 7

# 2. remat decision pair: compile-only HBM temp bytes, then chip-paced
#    steps/s on/off (decides whether the flagship ships rdst_remat).
step remat_mem timeout 900 python tools/remat_memcheck.py
step remat_speed timeout 1200 python tools/remat_speedcheck.py

# 3. W96 inference record (README cell) + swinir_std re-record with its
#    shipped pallas_kernels='swin' + pallas_quant='qkv' config keys.
step bench67 timeout 1800 python tools/bench_all.py --skip 1 2 3 4 5 8 9

# 4. headline sanity for BENCH_r03
step bench_final timeout 1200 python bench.py

echo "=== [$(date -u +%H:%M:%S)] queue3 complete"
