#!/usr/bin/env python
"""Declarative hardware-measurement queue (VERDICT r3 ask #8).

The single entry point for a TPU window: every pending measurement
lives in tools/pending_measurements.json (checked in), and

    nohup python tools/tpu_queue.py > /tmp/tpuq_driver.log 2>&1 &

runs them in listed (priority) order. Replaces the four overlapping
tpu_queue*.sh / run_queue.sh scripts of rounds 1-3.

Semantics:
  * each step runs under its own timeout IN ITS OWN PROCESS GROUP; on
    timeout (or any queue-side kill) the WHOLE group is killed, not just
    the direct child. This is the round-4 w96_100k postmortem fix:
    `subprocess.run(timeout=...)` only kills the immediate child
    (tools/supervise.sh), orphaning the `python train.py` grandchild —
    which kept the single TPU attached, so the next attempt died in
    2.7 s at device init with rc 1 while the orphan kept writing healthy
    progress into the truncated log.
  * a failing step logs and the queue moves on (steps are independent
    unless `needs` says otherwise); FAIL/TIMEOUT states carry the last
    lines of the step log so a silent `status: FAIL` can't hide a
    diagnosis again.
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
import signal
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


def _kill_group(proc, grace_s=10.0):
    """SIGTERM the step's whole process group, then SIGKILL stragglers.

    Children run with start_new_session=True so the group id == the
    child pid; killing the group reaches grandchildren (train.py under
    supervise.sh) that a plain proc.kill() would orphan on the chip.
    """
    for sig, wait in ((signal.SIGTERM, grace_s), (signal.SIGKILL, 5.0)):
        try:
            os.killpg(proc.pid, sig)
        except ProcessLookupError:
            return
        try:
            proc.wait(timeout=wait)
            return
        except subprocess.TimeoutExpired:
            continue
    proc.wait()


def log_tail(path, n=8):
    try:
        with open(path, "rb") as f:
            f.seek(0, os.SEEK_END)
            f.seek(max(0, f.tell() - 8192))
            lines = f.read().decode("utf-8", "replace").splitlines()
        return [ln for ln in lines if ln.strip()][-n:]
    except OSError:
        return []


def _run_once(step, log_path):
    """One attempt: own process group, timeout + LOG-STALL watchdog.

    The axon tunnel intermittently loses the first RPC of a fresh
    process: the step then sits in futex-wait at ~0 CPU forever while
    a retried fresh process usually succeeds (r5: three steps wedged
    this way in one morning; every manual kill+retry recovered). A
    step whose log hasn't grown for `log_stall_s` (default 900 s —
    training logs print every ~100 s, benches every few minutes) is
    killed and reported WEDGED so the caller can retry."""
    stall_s = float(step.get("log_stall_s", 900))
    with open(log_path, "w") as lf:
        proc = subprocess.Popen(
            step["cmd"], stdout=lf, stderr=subprocess.STDOUT,
            start_new_session=True)
        try:
            deadline = time.time() + step["timeout_s"]
            last_size, last_change = -1, time.time()
            while True:
                try:
                    rc = proc.wait(timeout=min(10.0, max(0.5, stall_s / 2)))
                    return rc, ("PASS" if rc == 0 else "FAIL")
                except subprocess.TimeoutExpired:
                    now = time.time()
                    try:
                        size = os.path.getsize(log_path)
                    except OSError:
                        size = -1
                    if size != last_size:
                        last_size, last_change = size, now
                    if now > deadline:
                        _kill_group(proc)
                        return -1, "TIMEOUT"
                    if now - last_change > stall_s:
                        _kill_group(proc)
                        return -1, "WEDGED"
        except BaseException:          # queue itself killed/interrupted
            _kill_group(proc)
            raise
        finally:
            # Whatever happened, never leave the group running: an
            # orphaned trainer holds the single TPU and every later
            # step dies at device init (r4 w96_100k failure mode).
            _kill_group(proc, grace_s=2.0)


def run_step(step, log_path):
    """Run one step, retrying wedged attempts (lost first RPC)."""
    retries = int(step.get("retries", 2))
    for attempt in range(retries + 1):
        rc, status = _run_once(step, log_path)
        if status != "WEDGED" or attempt == retries:
            return rc, status
        stamp(f"{step['name']} attempt {attempt + 1} WEDGED "
              f"(log stalled) — killing group and retrying")
        time.sleep(15)
    return rc, status


def run_steps(steps, state, only=None, skip=(), force=False,
              log_dir="/tmp", save=lambda st: None):
    for s in steps:
        name = s["name"]
        if only is not None and name not in only:
            continue
        if name in skip:
            continue
        prev = state.get(name, {})
        if prev.get("status") == "PASS" and not force:
            stamp(f"{name} SKIP (already PASS at {prev.get('finished')})")
            continue
        missing = [d for d in s.get("needs", [])
                   if state.get(d, {}).get("status") != "PASS"]
        if missing:
            stamp(f"{name} BLOCKED (needs {missing})")
            continue
        log = os.path.join(log_dir, f"tpuq_{name}.log")
        # settle gap between device-attaching processes: two r5 steps
        # launched <3 s after their predecessor exited wedged forever
        # at their FIRST device op (futex-wait, 0 CPU — the tunnel's
        # lost-RPC signature), while steps starting later ran fine.
        # 15 s costs nothing against multi-minute steps.
        time.sleep(15)
        stamp(f"{name} START -> {log}")
        t0 = time.time()
        rc, status = run_step(s, log)
        state[name] = {
            "status": status, "rc": rc,
            "wall_s": round(time.time() - t0, 1),
            "finished": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "log": log,
        }
        if status != "PASS":
            state[name]["tail"] = log_tail(log)
        save(state)
        stamp(f"{name} {status} rc={rc} ({state[name]['wall_s']}s)")
        if status != "PASS":
            for ln in state[name]["tail"]:
                stamp(f"  | {ln}")


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
    run_steps(steps, state, only=args.only, skip=args.skip,
              force=args.force, save=save_state)
    stamp("queue complete")


if __name__ == "__main__":
    sys.exit(main())
