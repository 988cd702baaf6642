#!/usr/bin/env python
"""Declarative hardware-measurement queue (VERDICT r3 ask #8).

The single entry point for a TPU window: every pending measurement
lives in tools/pending_measurements.json (checked in), and

    nohup python tools/tpu_queue.py > /tmp/tpuq_driver.log 2>&1 &

runs them in listed (priority) order. Replaces the four overlapping
tpu_queue*.sh / run_queue.sh scripts of rounds 1-3.

Semantics:
  * each step runs under its own timeout; a failing step logs and the
    queue moves on (steps are independent unless `needs` says otherwise)
  * per-step logs land in /tmp/tpuq_<name>.log
  * completion state persists in tools/queue_state.json: re-running the
    queue skips steps that already PASSed, so an interrupted window
    resumes with the same one command
  * `--only NAME...` / `--skip NAME...` / `--force` (ignore state) for
    manual control; `--list` prints the pending table and exits

Step schema (pending_measurements.json):
  {"name": str,            # unique id -> log + state key
   "cmd": [str, ...],      # argv, run from the repo root
   "timeout_s": int,
   "note": str,            # why this measurement exists / where it lands
   "needs": [str, ...]}    # optional: names that must have PASSed first
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PENDING = os.path.join(ROOT, "tools", "pending_measurements.json")
STATE = os.path.join(ROOT, "tools", "queue_state.json")


def load_state():
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {}


def save_state(state):
    with open(STATE, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)


def stamp(msg):
    print(f"=== [{time.strftime('%H:%M:%S', time.gmtime())}] {msg}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--force", action="store_true",
                    help="re-run steps even if queue_state says PASS")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    with open(PENDING) as f:
        steps = json.load(f)["steps"]
    names = [s["name"] for s in steps]
    assert len(set(names)) == len(names), "duplicate step names"

    state = load_state()
    if args.list:
        for s in steps:
            st = state.get(s["name"], {}).get("status", "pending")
            print(f"{st:>8}  {s['name']:<24} {s['note']}")
        return

    os.chdir(ROOT)
    # data/ is wiped between rounds; regenerate missing corpora before
    # burning chip time on steps that would FileNotFoundError at startup.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ensure_fixtures
    ensure_fixtures.ensure()
    for s in steps:
        name = s["name"]
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        prev = state.get(name, {})
        if prev.get("status") == "PASS" and not args.force:
            stamp(f"{name} SKIP (already PASS at {prev.get('finished')})")
            continue
        missing = [d for d in s.get("needs", [])
                   if state.get(d, {}).get("status") != "PASS"]
        if missing:
            stamp(f"{name} BLOCKED (needs {missing})")
            continue
        log = f"/tmp/tpuq_{name}.log"
        stamp(f"{name} START -> {log}")
        t0 = time.time()
        try:
            with open(log, "w") as lf:
                rc = subprocess.run(
                    s["cmd"], stdout=lf, stderr=subprocess.STDOUT,
                    timeout=s["timeout_s"]).returncode
            status = "PASS" if rc == 0 else "FAIL"
        except subprocess.TimeoutExpired:
            rc, status = -1, "TIMEOUT"
        state[name] = {
            "status": status, "rc": rc,
            "wall_s": round(time.time() - t0, 1),
            "finished": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "log": log,
        }
        save_state(state)
        stamp(f"{name} {status} rc={rc} ({state[name]['wall_s']}s)")
    stamp("queue complete")


if __name__ == "__main__":
    sys.exit(main())
