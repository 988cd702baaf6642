"""Serving subsystem: AOT bundle export/roundtrip + batching server.

Framework extension (no reference counterpart); gates:

* exported StableHLO bundle reproduces the live model bitwise on CPU;
* bundle loads + predicts WITHOUT the training config or data tree;
* batch bucketing pads/slices correctly across chunk boundaries;
* the HTTP server answers health/metadata/predict and coalesces
  concurrent same-shape requests into shared dispatches.
"""

import io
import json
import pathlib
import threading
import urllib.request

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
SNAPSHOT = REPO / "weights" / "rdst_tiny2k_oasis_x4.msgpack"

pytestmark = pytest.mark.skipif(not SNAPSHOT.exists(),
                                reason="tiny golden snapshot not present")


def _tiny_paras():
    from rdst_tpu.config import ParametersLoader

    p = ParametersLoader(str(REPO / "config_files" / "rdst_tiny_oasis_x4.ini"))
    p.set("well_trained_single_scale_model_g", str(SNAPSHOT))
    return p


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory):
    from rdst_tpu.serving import export_bundle

    out = tmp_path_factory.mktemp("bundle")
    export_bundle(_tiny_paras(), str(out), lr_shapes=[(24, 28)])
    return out


@pytest.fixture(scope="module")
def live():
    from rdst_tpu.serving import LiveModel

    return LiveModel(_tiny_paras(), max_batch=8)


class TestBundle:
    def test_manifest(self, bundle_dir):
        man = json.loads((bundle_dir / "MANIFEST.json").read_text())
        assert man["feature_generator"] == "rdst"
        assert man["scales"] == [4.0]
        assert man["layout"] == "NHWC"
        (e,) = man["entries"]
        assert e["lr_hw"] == [24, 28]
        assert "cpu" in e["platforms"]  # no kernels -> portable artifact
        assert (bundle_dir / e["file"]).stat().st_size > 10_000
        assert (bundle_dir / "params.msgpack").exists()

    def test_roundtrip_matches_live_model(self, bundle_dir, live, rng):
        from rdst_tpu.serving import ServingBundle

        b = ServingBundle.load(str(bundle_dir), max_batch=8)
        x = rng.random((3, 24, 28, 1), dtype=np.float32)
        y_b = b.predict(x, 4.0)
        y_l = live.predict(x, 4.0)
        assert y_b.shape == (3, 96, 112, 1)
        # same StableHLO graph, same params, same platform -> bitwise
        np.testing.assert_array_equal(y_b, y_l)

    def test_bundle_is_self_contained(self, bundle_dir, rng):
        """Loading must touch only the bundle dir (no config, no data)."""
        from rdst_tpu.serving import ServingBundle

        b = ServingBundle.load(str(bundle_dir))
        x = rng.random((24, 28), dtype=np.float32)  # rank-2 input form
        y = b.predict(x, 4.0)
        assert y.shape == (1, 96, 112, 1)
        assert np.isfinite(y).all()

    def test_bucket_caps_at_max_batch(self):
        """Oversized requests must split into top-bucket chunks, not
        dispatch one giant (fresh-compile, OOM-risk) executable."""
        from rdst_tpu.serving.export import _bucket, resolve_buckets

        dense = resolve_buckets(64, "pow2")
        assert dense == (1, 2, 4, 8, 16, 32, 64)
        assert _bucket(200, dense) == 64
        assert _bucket(1000, dense) == 64
        assert _bucket(5, resolve_buckets(2, "pow2")) == 2
        assert _bucket(3, dense) == 4
        assert _bucket(1, dense) == 1

    def test_sparse_default_ladder(self, monkeypatch):
        """r5 cold-start fix: the default ladder is sparse {1, 8, 64}
        (3 compiles, was 7 — 222 s measured on the dev tunnel), n maps
        to the smallest admitting bucket, max_batch always tops the
        ladder, and the env/spec overrides work."""
        from rdst_tpu.serving.export import _bucket, resolve_buckets

        monkeypatch.delenv("RDST_TPU_SERVE_BUCKETS", raising=False)
        b = resolve_buckets(64)
        assert b == (1, 8, 64)
        assert _bucket(1, b) == 1
        assert _bucket(2, b) == 8  # the documented padding tradeoff
        assert _bucket(8, b) == 8
        assert _bucket(9, b) == 64
        # max_batch below a default rung: ladder still capped + topped
        assert resolve_buckets(6) == (1, 6)
        assert resolve_buckets(64, "1,4,64") == (1, 4, 64)
        monkeypatch.setenv("RDST_TPU_SERVE_BUCKETS", "2,32")
        assert resolve_buckets(64) == (2, 32, 64)

    def test_bucketing_pad_and_chunks(self, bundle_dir, rng):
        """n=5 with max_batch=2 -> chunks of 2/2/1(padded); outputs must
        be per-slice identical to a single n=5 whole-batch run."""
        from rdst_tpu.serving import ServingBundle

        x = rng.random((5, 24, 28, 1), dtype=np.float32)
        small = ServingBundle.load(str(bundle_dir), max_batch=2)
        big = ServingBundle.load(str(bundle_dir), max_batch=8)
        y_small = small.predict(x, 4.0)
        y_big = big.predict(x, 4.0)
        assert y_small.shape == y_big.shape == (5, 96, 112, 1)
        # rdst normalizes per-batch nothing; forward is per-slice pure,
        # so chunking must not change values
        np.testing.assert_allclose(y_small, y_big, atol=1e-5)

    def test_kernels_on_export_writes_portable_twin(self, tmp_path, live,
                                                    rng, monkeypatch):
        """pallas_kernels config -> TPU-only primary entry (Mosaic
        custom calls) + portable XLA twin; a CPU host must load the
        twin and match the live XLA model. kernels_on keys off the
        EFFECTIVE trace content (r4 fix: on a TPU host the env-unset
        DEFAULT is 'rdstb' — the old raw-env read mislabeled it
        kernels-off and export died lowering Mosaic for 'cpu'), so on
        this CPU host the test forces interpret mode to engage them."""
        from rdst_tpu.serving import ServingBundle, export_bundle

        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        p = _tiny_paras()
        p.set("pallas_kernels", "swin")
        p.set("inference_dtype", "bfloat16")  # kernel gate needs bf16
        export_bundle(p, str(tmp_path), lr_shapes=[(24, 28)])
        man = json.loads((tmp_path / "MANIFEST.json").read_text())
        (e,) = man["entries"]
        assert e["platforms"] == ["tpu"]
        assert (tmp_path / e["portable_file"]).exists()

        b = ServingBundle.load(str(tmp_path))
        assert b.backend == "cpu"
        x = rng.random((2, 24, 28, 1), dtype=np.float32)
        y = b.predict(x, 4.0)  # must route to the portable twin
        # bf16 fast path vs the f32 live model: loose agreement only
        y_ref = live.predict(x, 4.0)
        rel = (np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref))
        assert rel < 0.02, rel

    def test_unknown_scale_errors(self, bundle_dir):
        from rdst_tpu.serving import ServingBundle

        b = ServingBundle.load(str(bundle_dir))
        with pytest.raises(ValueError, match="no entry for scale"):
            b.predict(np.zeros((1, 24, 28, 1), np.float32), 2.0)


class TestServer:
    @pytest.fixture(scope="class")
    def server(self, live):
        from rdst_tpu.serving.server import InferenceServer

        srv = InferenceServer(live, port=0, max_batch=8, batch_wait_ms=20)
        srv.start_background()
        yield srv
        srv.close()

    def _post(self, srv, x, scale=4.0):
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/predict?scale={scale}",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return np.load(io.BytesIO(r.read()))

    def test_health_and_metadata(self, server):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/v1/metadata",
                timeout=30) as r:
            man = json.loads(r.read())
        assert man["feature_generator"] == "rdst"

    def test_predict_roundtrip(self, server, live, rng):
        x = rng.random((2, 24, 28, 1), dtype=np.float32)
        y = self._post(server, x)
        np.testing.assert_array_equal(y, live.predict(x, 4.0))

    def test_concurrent_requests_coalesce(self, server, live, rng):
        """4 threads x 1 slice: every caller gets ITS OWN slice back
        (the batcher must split coalesced outputs correctly)."""
        xs = [rng.random((1, 24, 28, 1), dtype=np.float32)
              for _ in range(4)]
        outs = [None] * 4

        def call(i):
            outs[i] = self._post(server, xs[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i in range(4):
            np.testing.assert_array_equal(outs[i], live.predict(xs[i], 4.0))

    def test_64_client_burst_no_resets(self, server, rng):
        """64 SIMULTANEOUS connects must all be served: socketserver's
        default listen backlog of 5 made the kernel RESET connections
        under exactly this burst on the hardware serving bench (r4);
        _BurstHTTPServer raises request_queue_size."""
        x = rng.random((1, 24, 28, 1), dtype=np.float32)
        errs = [None] * 64

        def call(i):
            try:
                y = self._post(server, x)
                assert y.shape == (1, 96, 112, 1)
            except Exception as e:  # noqa: BLE001 — recorded for assert
                errs[i] = e

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(64)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        failed = [e for e in errs if e is not None]
        assert not failed, failed[:3]

    def test_warmup_buckets(self, server, live, rng):
        """warmup() pre-compiles every power-of-two bucket for the
        given (LR shape, scale) — r4: a cold 64-client burst on the
        hardware bench measured p50 42.8 s of lazy per-bucket compiles.
        After warmup a mixed-size burst must still return exact
        per-caller outputs (warmup must not disturb batcher state)."""
        dt = server.warmup(lr_hw=(24, 28), scale=4.0)
        assert dt >= 0.0
        xs = [rng.random((n, 24, 28, 1), dtype=np.float32)
              for n in (1, 3, 2)]
        outs = [None] * len(xs)

        def call(i):
            outs[i] = self._post(server, xs[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(xs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, x in enumerate(xs):
            np.testing.assert_array_equal(outs[i], live.predict(x, 4.0))

    def test_warmup_requires_scale_with_shape(self, server):
        with pytest.raises(ValueError):
            server.warmup(lr_hw=(24, 28))

    def test_bad_input_is_400(self, server):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/predict?scale=4",
            data=b"not an npy", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read())

    def test_unknown_route_is_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/nope", timeout=30)
        assert ei.value.code == 404


class TestMeshServing:
    def test_live_model_dp_mesh_parity(self, live, rng):
        """mesh_shape=[8] LiveModel: batch sharded over the 8-device
        CPU mesh, output matches the single-device predictor and
        buckets stay mesh-divisible."""
        from rdst_tpu.serving import LiveModel

        p = _tiny_paras()
        p.set("mesh_shape", [8])
        dp = LiveModel(p, max_batch=16)
        assert dp.manifest["mesh"]["data"] == 8
        # n=3 < 8 devices: bucket must pad up to the mesh multiple
        x = rng.random((3, 24, 28, 1), dtype=np.float32)
        np.testing.assert_allclose(dp.predict(x, 4.0),
                                   live.predict(x, 4.0), atol=1e-5)
        # n=11: chunked (8 + padded 8) across the mesh
        x = rng.random((11, 24, 28, 1), dtype=np.float32)
        y = dp.predict(x, 4.0)
        assert y.shape == (11, 96, 112, 1)
        np.testing.assert_allclose(y, live.predict(x, 4.0), atol=1e-5)


class TestVolume:
    def test_sr_volume_live(self, live, rng):
        """3-D volume -> in-plane SR along the slice axis; intensities
        restored to the input range."""
        from rdst_tpu.serving.volume import sr_volume

        vol = (rng.random((24, 28, 3), dtype=np.float32) * 400 + 100)
        out = sr_volume(live, vol, 4.0, axis=2)
        assert out.shape == (96, 112, 3)
        assert 50 < out.min() and out.max() < 600  # back in input space

    def test_sr_volume_rejects_nan(self, live):
        from rdst_tpu.serving.volume import sr_volume

        vol = np.full((24, 28, 2), np.nan, np.float32)
        with pytest.raises(ValueError, match="non-finite"):
            sr_volume(live, vol, 4.0)

    def test_volume_cli_nifti_roundtrip(self, bundle_dir, tmp_path, rng):
        """CLI: .nii.gz in -> SR .nii.gz out, through the AOT bundle."""
        from rdst_tpu.data import io
        from rdst_tpu.serving.volume import main

        vol = rng.random((24, 28, 2), dtype=np.float32)
        src = str(tmp_path / "in.nii.gz")
        dst = str(tmp_path / "out.nii.gz")
        io.save(src, vol)
        main(["--bundle", str(bundle_dir), "--in", src, "--out", dst,
              "--scale", "4"])
        out = io.load(dst).get_fdata()
        assert out.shape == (96, 112, 2)
        assert np.isfinite(out).all()

    def test_client_predictor_over_http(self, live, rng):
        """SRClient satisfies the predictor contract: sr_volume runs
        over the wire and matches the local result."""
        from rdst_tpu.serving.client import SRClient
        from rdst_tpu.serving.server import InferenceServer
        from rdst_tpu.serving.volume import sr_volume

        srv = InferenceServer(live, port=0, max_batch=8)
        srv.start_background()
        try:
            client = SRClient(f"http://127.0.0.1:{srv.port}")
            assert client.health()["status"] == "ok"
            assert client.metadata()["feature_generator"] == "rdst"
            vol = rng.random((24, 28, 2), dtype=np.float32)
            np.testing.assert_allclose(
                sr_volume(client, vol, 4.0),
                sr_volume(live, vol, 4.0), atol=1e-5)
        finally:
            srv.close()


class TestBatcherShutdown:
    def test_close_fails_queued_slots(self):
        """Slots still queued at close() must error out, not hang."""
        import time

        from rdst_tpu.serving.server import Batcher

        class Slow:
            def predict(self, x, scale):
                time.sleep(0.5)
                return x

        b = Batcher(Slow(), max_batch=1, batch_wait_ms=1)
        results = []

        def call():
            try:
                b.submit(np.zeros((1, 4, 4, 1), np.float32), 4.0)
                results.append("ok")
            except RuntimeError:
                results.append("shutdown")

        threads = [threading.Thread(target=call) for _ in range(6)]
        for t in threads:
            t.start()
        time.sleep(0.1)  # let the dispatcher start on the first slot
        b.close()
        for t in threads:
            t.join(timeout=30)
            assert not t.is_alive(), "submitter hung after close()"
        assert len(results) == 6
        assert "shutdown" in results  # the queued tail was failed

    def test_submit_after_close_raises(self):
        from rdst_tpu.serving.server import Batcher

        class Echo:
            def predict(self, x, scale):
                return x

        b = Batcher(Echo())
        b.close()
        with pytest.raises(RuntimeError, match="shut down"):
            b.submit(np.zeros((1, 4, 4, 1), np.float32), 4.0)
