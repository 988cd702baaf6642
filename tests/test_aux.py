"""Aux subsystem tests: wavelets, PatchGAN, FLOPs/profiling, figures."""

import numpy as np
import pytest


class TestWavelet:
    @pytest.mark.parametrize("wavelet", ["haar", "db2"])
    def test_perfect_reconstruction(self, rng, wavelet):
        import jax.numpy as jnp

        from rdst_tpu.nn.wavelet import dwt2, idwt2, wavedec2, waverec2

        x = jnp.asarray(rng.random((2, 16, 24, 3)).astype(np.float32))
        ll, bands = dwt2(x, wavelet)
        assert ll.shape == (2, 8, 12, 3) and bands.shape == (2, 8, 12, 3, 3)
        assert float(jnp.abs(idwt2(ll, bands, wavelet) - x).max()) < 1e-5
        ll2, cs = wavedec2(x, wavelet, 2)
        assert ll2.shape == (2, 4, 6, 3)
        assert float(jnp.abs(waverec2(ll2, cs, wavelet) - x).max()) < 1e-5

    def test_haar_energy_preserved(self, rng):
        import jax.numpy as jnp

        from rdst_tpu.nn.wavelet import dwt2

        x = jnp.asarray(rng.random((1, 8, 8, 1)).astype(np.float32))
        ll, bands = dwt2(x, "haar")
        e_in = float(jnp.sum(x**2))
        e_out = float(jnp.sum(ll**2) + jnp.sum(bands**2))
        assert abs(e_in - e_out) < 1e-4  # orthogonal transform

    def test_wavelet_sr_model(self, rng):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models.wavelet_sr import WaveletSR

        m = WaveletSR(embed_dim=16, depths=(2,), num_heads=(2,), window_size=4,
                      sr_scale=2)
        x = jnp.asarray(rng.random((1, 16, 16, 1)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (1, 32, 32, 1)


class TestPatchGAN:
    def test_patch_map_and_losses(self, rng):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.losses.patchgan import GANLoss, PatchGAN, gradient_penalty

        d = PatchGAN(ndf=16, n_layers=2)
        a = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
        b = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
        params = d.init(jax.random.PRNGKey(0), a, b)
        pred = d.apply(params, a, b)
        assert pred.ndim == 4 and pred.shape[-1] == 1
        assert pred.shape[1] < 32  # patch-level map

        for mode in ("lsgan", "vanilla", "wgangp"):
            crit = GANLoss(mode)
            assert np.isfinite(float(crit(pred, True)))
            assert np.isfinite(float(crit(pred, False)))

        gp = gradient_penalty(lambda h: d.apply(params, h, b), b, a,
                              jax.random.PRNGKey(1))
        assert np.isfinite(float(gp))


class TestFlopsProfiling:
    def test_count_params_and_flops(self):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models.edsr import EDSR
        from rdst_tpu.utils.flops import count_flops, count_params, model_summary

        m = EDSR(n_resblocks=1, n_feats=8, sr_scale=2)
        x = jnp.zeros((1, 8, 8, 1))
        params = m.init(jax.random.PRNGKey(0), x)
        assert count_params(params) > 1000
        flops, cost = count_flops(lambda p, xx: m.apply(p, xx), params, x)
        assert flops > 1e5
        assert "params" in model_summary(m, params, x).lower()

    def test_throughput_counter(self):
        from rdst_tpu.utils.profiling import Throughput

        t = Throughput(warmup_steps=1)
        for _ in range(3):
            t.step(10)
        rep = t.report()
        assert rep["steps"] == 3 and rep["items_per_sec"] > 0


class TestSegUNetPadding:
    def test_non_multiple_of_32_input(self, rng):
        import jax

        from rdst_tpu.models.seg_unet import init_seg_unet

        model, variables = init_seg_unet(1, 4, spatial=(32, 32))
        x = rng.random((1, 88, 104, 1)).astype(np.float32)
        feats, dec, logits = model.apply(variables, x, train=False)
        assert logits.shape == (1, 88, 104, 4)
        assert dec.shape[:3] == (1, 88, 104)


class TestInceptionFID:
    def test_architecture_matches_torchvision_size(self):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.metrics.inception import InceptionV3Pool3

        m = InceptionV3Pool3()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert 21_700_000 < n < 21_900_000  # torchvision inception_v3 features
        y = m.apply(v, jnp.zeros((2, 75, 75, 3)))
        assert y.shape == (2, 2048)

    def test_weight_import_roundtrip(self):
        """flax tree -> torch-format keys -> importer -> identical tree."""
        import jax
        import jax.numpy as jnp
        import torch
        from flax.traverse_util import flatten_dict

        from rdst_tpu.metrics.inception import (
            InceptionV3Pool3,
            load_fid_inception_params,
        )

        m = InceptionV3Pool3()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))

        sd = {}
        for path, val in flatten_dict(v["params"]).items():
            *mod, layer, leaf = path
            base = ".".join(mod)
            if layer == "conv" and leaf == "kernel":
                sd[f"{base}.conv.weight"] = torch.from_numpy(
                    np.asarray(val).transpose(3, 2, 0, 1).copy())
            elif layer == "bn":
                name = {"scale": "weight", "bias": "bias"}[leaf]
                sd[f"{base}.bn.{name}"] = torch.from_numpy(np.asarray(val).copy())
        for path, val in flatten_dict(v["batch_stats"]).items():
            *mod, _, leaf = path
            base = ".".join(mod)
            name = {"mean": "running_mean", "var": "running_var"}[leaf]
            sd[f"{base}.bn.{name}"] = torch.from_numpy(np.asarray(val).copy())
        sd["fc.weight"] = torch.zeros(1000, 2048)  # must be skipped

        import tempfile, os

        with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
            torch.save(sd, f.name)
            path = f.name
        try:
            restored = load_fid_inception_params(path)
        finally:
            os.unlink(path)

        want = flatten_dict(v["params"])
        got = flatten_dict(restored["params"])
        assert set(want) == set(got)
        for k in want:
            assert np.allclose(np.asarray(want[k]), got[k]), k
        assert set(flatten_dict(v["batch_stats"])) == set(
            flatten_dict(restored["batch_stats"]))


class TestVolumeIOEdgeCases:
    def test_big_endian_header(self, tmp_path, rng):
        """Analyze headers can be big-endian; the reader must byte-swap."""
        import struct

        from rdst_tpu.data import io

        x = rng.random((4, 5, 6)).astype(">f4")
        hdr = bytearray(348)
        struct.pack_into(">i", hdr, 0, 348)
        struct.pack_into(">8h", hdr, 40, 3, 4, 5, 6, 1, 1, 1, 1)
        struct.pack_into(">h", hdr, 70, 16)  # float32
        (tmp_path / "v.hdr").write_bytes(bytes(hdr))
        (tmp_path / "v.img").write_bytes(np.asfortranarray(x).tobytes(order="F"))
        v = io.load(str(tmp_path / "v.hdr"))
        assert v.shape == (4, 5, 6)
        assert np.allclose(v.get_fdata(), x.astype(np.float64))

    def test_scl_slope_applied(self, tmp_path):
        import struct

        from rdst_tpu.data import io

        data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
        p = str(tmp_path / "v.nii")
        io.save(p, data)
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
        struct.pack_into("<f", raw, 116, -1.0)  # scl_inter
        open(p, "wb").write(bytes(raw))
        v = io.load(p)
        assert np.allclose(v.get_fdata(), data * 2.0 - 1.0)

    def test_truncated_header_raises(self, tmp_path):
        from rdst_tpu.data import io

        p = tmp_path / "bad.nii"
        p.write_bytes(b"\x00" * 100)
        with pytest.raises(ValueError):
            io.load(str(p))

    def test_negative_dim_rejected(self, tmp_path):
        """A crafted header with a negative dim must raise a named
        error, not misbehave inside numpy."""
        import struct

        from rdst_tpu.data import io

        p = str(tmp_path / "v.nii")
        io.save(p, np.zeros((2, 2, 2), np.float32))
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<8h", raw, 40, 3, 2, -2, 2, 1, 1, 1, 1)
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="invalid volume dims"):
            io.load(p)

    def test_truncated_payload_rejected(self, tmp_path):
        """Header says more voxels than the payload holds -> a clear
        'truncated or corrupt' error naming the file."""
        from rdst_tpu.data import io

        p = str(tmp_path / "v.nii")
        io.save(p, np.zeros((4, 4, 4), np.float32))
        blob = open(p, "rb").read()
        open(p, "wb").write(blob[:-64])  # chop the payload tail
        with pytest.raises(ValueError, match="truncated or corrupt"):
            io.load(p)

    def test_oversized_dims_rejected(self, tmp_path):
        """Absurd dims (multi-GB claim vs tiny payload) must fail the
        size check instead of attempting allocation."""
        import struct

        from rdst_tpu.data import io

        p = str(tmp_path / "v.nii")
        io.save(p, np.zeros((2, 2, 2), np.float32))
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<8h", raw, 40, 3, 32000, 32000, 32000, 1, 1, 1, 1)
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="truncated or corrupt"):
            io.load(p)


class TestOptimFactories:
    def test_schedules(self):
        from rdst_tpu.config import ParametersLoader
        from rdst_tpu.utils.optim import make_schedule

        p = ParametersLoader.from_dict({
            "learning_rate": 1.0, "lr_decay_type": "step 10",
            "lr_decay_gamma": 0.5})
        s = make_schedule(p)
        assert s(0) == 1.0 and s(10) == 0.5 and s(25) == 0.25

        p.set("lr_decay_type", "milestones 5 15")
        s = make_schedule(p)
        assert float(s(0)) == 1.0
        assert float(s(6)) == 0.5
        assert float(s(16)) == 0.25

        p.set("lr_decay_type", None)
        assert float(make_schedule(p)(100)) == 1.0

    @pytest.mark.parametrize("opt", ["Adam", "SGD", "RMSprop"])
    def test_optimizers_step(self, opt, rng):
        import jax.numpy as jnp
        import optax

        from rdst_tpu.config import ParametersLoader
        from rdst_tpu.utils.optim import make_optimizer

        p = ParametersLoader.from_dict({
            "opt": opt, "learning_rate": 0.1, "weight_decay": 0.01,
            "momentum": 0.9, "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-8,
            "lr_decay_type": None, "lr_decay_gamma": 0.5})
        tx = make_optimizer(p)
        params = {"w": jnp.ones(4)}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones(4)}, state, params)
        new = optax.apply_updates(params, updates)
        assert float(new["w"][0]) < 1.0  # moved against the gradient


def test_flops_cli_json(capsys):
    """python -m rdst_tpu.utils.flops emits one JSON line with compiled
    forward + grad costs for a config (docs/SCALING.md surface)."""
    import json

    from rdst_tpu.utils.flops import main

    main(["--config-file", "config_files/rdst_tiny_oasis_x4.ini",
          "--batch", "1", "--grad"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["model"] == "rdst"
    assert out["params"] > 1e5
    assert out["grad_flops"] > out["forward_flops"] > 1e8
    assert out["forward_bytes"] > 0


class TestEnsureFixtures:
    """tools/ensure_fixtures.py: the queue preflight that regenerates
    wiped data corpora (data/ is gitignored; a missing corpus burned a
    hardware window on 2026-08-19 before this existed)."""

    def _mod(self):
        import importlib.util
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "tools",
                            "ensure_fixtures.py")
        spec = importlib.util.spec_from_file_location("ensure_fixtures", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_corpus_table_covers_every_config(self):
        # every data_folder referenced by a shipped .ini must have a
        # regeneration recipe, or a fresh checkout can't train it
        import configparser
        import glob
        import os
        mod = self._mod()
        roots = set(mod.CORPORA)
        for ini in glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                          "config_files", "*.ini")):
            cp = configparser.ConfigParser()
            cp.read(ini)
            folder = cp["DEFAULT"].get("data_folder", "").strip("'\"")
            # a missing/misplaced data_folder must fail here, not make
            # the coverage check vacuous for that config (advisor r4)
            assert folder, f"{ini}: no data_folder in [DEFAULT]"
            rel = os.path.normpath(folder)
            assert rel in roots, f"{ini}: {rel} missing from CORPORA"

    def test_present_corpora_not_regenerated(self, tmp_path, monkeypatch):
        import subprocess
        mod = self._mod()
        (tmp_path / "data" / "X" / "p1").mkdir(parents=True)
        (tmp_path / "data" / "X" / mod.MARKER).write_text("ok\n")
        monkeypatch.setattr(mod, "ROOT", str(tmp_path))
        monkeypatch.setattr(mod, "CORPORA", {"data/X": ["--dataset", "oasis"]})
        calls = []
        monkeypatch.setattr(subprocess, "run",
                            lambda *a, **k: calls.append(a))
        assert mod.ensure() == []
        assert calls == []

    def test_missing_corpus_triggers_regeneration(self, tmp_path, monkeypatch):
        import subprocess
        mod = self._mod()
        monkeypatch.setattr(mod, "ROOT", str(tmp_path))
        monkeypatch.setattr(mod, "CORPORA", {"data/X": ["--dataset", "oasis"]})
        calls = []
        monkeypatch.setattr(subprocess, "run",
                            lambda cmd, **k: calls.append(cmd))
        assert mod.ensure() == ["data/X"]
        assert len(calls) == 1 and "--root" in calls[0]
        # a clean generator run stamps the completion marker
        assert (tmp_path / "data" / "X" / mod.MARKER).exists()

    def test_partial_corpus_regenerated(self, tmp_path, monkeypatch):
        # non-empty dir WITHOUT the completion marker == a generator
        # that was killed mid-run; it must be regenerated (advisor r4)
        import subprocess
        mod = self._mod()
        (tmp_path / "data" / "X" / "p1").mkdir(parents=True)
        monkeypatch.setattr(mod, "ROOT", str(tmp_path))
        monkeypatch.setattr(mod, "CORPORA", {"data/X": ["--dataset", "oasis"]})
        calls = []
        monkeypatch.setattr(subprocess, "run",
                            lambda cmd, **k: calls.append(cmd))
        assert mod.ensure() == ["data/X"]
        assert len(calls) == 1

    def test_cli_only_filter_normalizes_and_rejects(self):
        import pytest as _pytest
        mod = self._mod()
        # trailing slash / ./ prefix normalize onto the CORPORA key
        assert mod._normalize_only(["./data/OASIS/example/"]) == [
            "data/OASIS/example"]
        with _pytest.raises(SystemExit):
            mod._normalize_only(["data/NOPE"])


class TestTpuQueue:
    """tools/tpu_queue.py step execution: the r4 w96_100k postmortem.

    subprocess.run(timeout=...) only killed the direct child
    (supervise.sh), orphaning `python train.py` — which kept the single
    TPU attached so the restart died in 2.7 s at device init, and the
    FAIL state carried no diagnosis. Steps now run in their own process
    group, timeouts kill the WHOLE group, and non-PASS states record the
    log tail."""

    def _mod(self):
        import importlib.util
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "tools",
                            "tpu_queue.py")
        spec = importlib.util.spec_from_file_location("tpu_queue", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_timeout_kills_grandchildren(self, tmp_path):
        import os
        import time
        mod = self._mod()
        pidfile = tmp_path / "grandchild.pid"
        # bash (child) spawns sleep (grandchild) — the supervise.sh /
        # train.py shape. Old code killed only bash; sleep survived.
        step = {"name": "orphan", "timeout_s": 2,
                "cmd": ["bash", "-c",
                        f"sleep 300 & echo $! > {pidfile}; wait"]}
        state = {}
        mod.run_steps([step], state, log_dir=str(tmp_path))
        assert state["orphan"]["status"] == "TIMEOUT"
        pid = int(pidfile.read_text())
        for _ in range(50):  # allow init to reap the killed orphan
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                break
            time.sleep(0.1)
        else:
            os.kill(pid, 9)
            raise AssertionError(f"grandchild {pid} survived the timeout")

    def test_failure_records_log_tail(self, tmp_path):
        mod = self._mod()
        step = {"name": "boom", "timeout_s": 10,
                "cmd": ["bash", "-c", "echo the-diagnosis; exit 3"]}
        state = {}
        mod.run_steps([step], state, log_dir=str(tmp_path))
        assert state["boom"]["status"] == "FAIL"
        assert state["boom"]["rc"] == 3
        assert any("the-diagnosis" in ln for ln in state["boom"]["tail"])

    def test_log_stall_wedge_retries_and_recovers(self, tmp_path,
                                                  monkeypatch):
        # the r5 lost-first-RPC signature: the step hangs forever with
        # a silent log; a fresh attempt succeeds. The watchdog must
        # kill the stalled group and retry, ending PASS.
        mod = self._mod()
        monkeypatch.setattr(mod.time, "sleep", lambda s: None)
        marker = tmp_path / "attempted"
        step = {"name": "wedge", "timeout_s": 60, "log_stall_s": 1,
                "retries": 2,
                "cmd": ["bash", "-c",
                        f"if [ -e {marker} ]; then echo recovered; exit 0; "
                        f"fi; touch {marker}; echo starting; sleep 300"]}
        state = {}
        mod.run_steps([step], state, log_dir=str(tmp_path))
        assert state["wedge"]["status"] == "PASS"

    def test_log_stall_exhausts_retries(self, tmp_path, monkeypatch):
        mod = self._mod()
        monkeypatch.setattr(mod.time, "sleep", lambda s: None)
        step = {"name": "hang", "timeout_s": 60, "log_stall_s": 1,
                "retries": 1,
                "cmd": ["bash", "-c", "echo once; sleep 300"]}
        state = {}
        mod.run_steps([step], state, log_dir=str(tmp_path))
        assert state["hang"]["status"] == "WEDGED"
        assert state["hang"]["rc"] == -1

    def test_pass_skips_and_needs_block(self, tmp_path):
        mod = self._mod()
        steps = [
            {"name": "a", "timeout_s": 10, "cmd": ["false"]},
            {"name": "b", "timeout_s": 10, "cmd": ["true"], "needs": ["a"]},
            {"name": "c", "timeout_s": 10, "cmd": ["true"]},
        ]
        state = {"c": {"status": "PASS", "finished": "earlier"}}
        mod.run_steps(steps, state, log_dir=str(tmp_path))
        assert state["a"]["status"] == "FAIL"
        assert "b" not in state          # blocked on a's failure
        assert state["c"]["finished"] == "earlier"  # not re-run
