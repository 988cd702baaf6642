#!/usr/bin/env python
"""Fresh-process serving readiness (VERDICT r4 ask #7 — honest version).

``bench_serving``'s ``bucket_warmup_s`` times ``warmup()`` inside a
process whose buckets were already compiled by earlier bench phases, so
it measures the warm re-execution, NOT what a production restart pays.
This tool measures the real gap:

1. export a bundle (its own subprocess; cost recorded separately),
2. spawn a COLD ``rdst_tpu.serving.server --bundle ... --warmup``
   subprocess and time from spawn to the first successful HTTP predict
   — process start + jax init + bundle load + one XLA compile per
   ladder bucket + first executions, exactly a restart's readiness gap,
3. confirm post-ready latency with a short sequential predict run.

The parent process never imports jax: the axon tunnel's chip attach is
exclusive, so parent and child would deadlock at device init.

Merges ``fresh_process_ready_s`` (+ ladder, post-ready p50) into
SERVING_BENCH.json and prints one JSON line.
"""

import io
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = "config_files/rdst_e1_oasis_x4.ini"
WEIGHTS = "weights/rdst_e1_40k_best_oasis_x4.msgpack"
LR_HW = (40, 32)
SCALE = 4.0

EXPORT_SNIPPET = """
import sys
if {platform!r}:
    import jax
    jax.config.update("jax_platforms", {platform!r})
from rdst_tpu.config import ParametersLoader
from rdst_tpu.serving.export import export_bundle
paras = ParametersLoader({config!r})
paras.set("well_trained_single_scale_model_g", {weights!r})
paras.set("inference_dtype", "bfloat16")
paras.set("sr_scales_for_final_testing", [{scale!r}])
export_bundle(paras, sys.argv[1], lr_shapes=[{lr_hw!r}], scales=[{scale!r}])
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _predict_once(port, payload, timeout):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict?scale={SCALE}",
        data=payload, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
        assert resp.status == 200, resp.status
    return np.load(io.BytesIO(body), allow_pickle=False)


def main():
    os.chdir(ROOT)
    platform = sys.argv[1] if len(sys.argv) > 1 else ""
    out_path = "SERVING_BENCH.json" if not platform else \
        f"/tmp/SERVING_BENCH_{platform}.json"
    bdir = "/tmp/readiness_bundle"

    t0 = time.time()
    subprocess.run(
        [sys.executable, "-c",
         EXPORT_SNIPPET.format(config=CONFIG, weights=WEIGHTS,
                               scale=SCALE, lr_hw=LR_HW,
                               platform=platform), bdir],
        check=True)
    export_s = round(time.time() - t0, 2)
    print(f"bundle exported in {export_s}s", flush=True)

    port = _free_port()
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    np.save(buf, rng.random((1,) + LR_HW, dtype=np.float32))
    payload = buf.getvalue()

    t0 = time.time()
    cmd = [sys.executable, "-m", "rdst_tpu.serving.server",
           "--bundle", bdir, "--port", str(port), "--warmup"]
    if platform:
        cmd += ["--platform", platform]
    proc = subprocess.Popen(cmd, start_new_session=True)
    try:
        # phase 1: wait for the listen socket (server object constructed
        # after jax init + bundle load; warmup hasn't run yet)
        while True:
            try:
                socket.create_connection(("127.0.0.1", port),
                                         timeout=1).close()
                break
            except OSError:
                if proc.poll() is not None:
                    raise RuntimeError("server died before listening")
                time.sleep(0.5)
        listen_s = round(time.time() - t0, 2)
        # phase 2: one long-timeout predict. It sits in the accept
        # backlog through --warmup's per-bucket compiles and is served
        # the moment serve_forever starts: its completion IS readiness.
        _predict_once(port, payload, timeout=900)
        ready_s = round(time.time() - t0, 2)
        lat = []
        for _ in range(16):
            t1 = time.time()
            _predict_once(port, payload, timeout=60)
            lat.append(time.time() - t1)
        p50 = round(float(np.percentile(lat, 50)), 4)
    finally:
        try:
            os.killpg(proc.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass

    rec = {
        "bundle_export_s": export_s,
        "listen_after_s": listen_s,
        "fresh_process_ready_s": ready_s,
        "post_ready_single_slice_p50_s": p50,
        "note": "cold server subprocess: spawn -> first successful "
                "predict (jax init + bundle load + per-bucket compiles "
                "+ first execs); the honest restart readiness gap",
    }
    bench = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            bench = json.load(f)
    bench["fresh_process_readiness"] = rec
    with open(out_path, "w") as f:
        json.dump(bench, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
