"""Chip-paced train-step throughput with and without per-RDSTB remat.

tools/remat_memcheck.py showed rdst_remat=True cuts the flagship grad
step's HBM temp bytes 6.4x (8.33 GB -> 1.31 GB at batch 32). Training
on this chip is HBM-/glue-bound (PERF.md "Training throughput"), so
remat may be a *speed* win too, not just a memory one — this measures
it directly with bench_all's chip-paced scan methodology, and also
records a batch-128 run that only fits with remat on.

    python tools/remat_speedcheck.py [--config-file ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_all import bench_training  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file",
                    default="config_files/rdst_e1_40k_oasis20_x4.ini")
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    for name, extra in (
        ("remat-off-b32", {"rdst_remat": False, "train_batch_size": 32}),
        ("remat-on-b32", {"rdst_remat": True, "train_batch_size": 32}),
        # without remat this geometry needs ~33 GB of temps (> HBM);
        # with remat it is ~5.2 GB — the capability remat buys
        ("remat-on-b128", {"rdst_remat": True, "train_batch_size": 128}),
    ):
        try:
            rec = bench_training(name, args.config_file, steps=args.steps,
                                 extra=extra)
        except Exception as e:  # record OOMs as data, keep sweeping
            rec = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
