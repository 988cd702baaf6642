"""Differentiable DSTL-pair kernel (kernels/pair_train.py): gradient
parity in interpret mode on the CPU mesh.

Two layers of gating:
* kernel vs oracle — jax.grad of the IDENTICAL math (`_pair_ops` on
  arrays) must match the custom_vjp's Pallas backward near-exactly;
* model vs XLA — BasicLayer grads through the train kernel must track
  the plain XLA autodiff path within bf16 fast-path tolerance.
"""

import numpy as np
import pytest


@pytest.fixture()
def rng():
    """Fresh, locally-seeded generator: the session-scoped conftest
    `rng` makes the draws depend on which tests ran before, and the
    bf16-noise tolerances here are calibrated on fixed data."""
    return np.random.default_rng(0)


def _mk_params(rng, c, hid):
    import jax.numpy as jnp

    def arr(*s, scale=0.5):
        return jnp.asarray(rng.normal(0, scale, s), jnp.float32)

    return (arr(c, 3 * c, scale=c ** -0.5), arr(3 * c, scale=0.1),
            arr(c, c, scale=c ** -0.5), arr(c, scale=0.1),
            1 + 0.1 * arr(c), 0.1 * arr(c), 1 + 0.1 * arr(c), 0.1 * arr(c),
            arr(c, hid, scale=c ** -0.5), arr(hid, scale=0.1),
            arr(hid, c, scale=hid ** -0.5), arr(c, scale=0.1))


class TestPairTrainKernel:
    @pytest.mark.parametrize("shift,with_dpf", [(0, False), (2, False),
                                                (2, True)])
    def test_grad_parity_vs_oracle(self, rng, shift, with_dpf):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels import pair_train as ptr
        from rdst_tpu.kernels.swin_block import (head_mask_arr,
                                                 pack_bias_fast,
                                                 prep_block_params,
                                                 seg_ones_arr)

        c, nh, ws = 12, 2, 4
        h = w = 8
        nwh = nww = h // ws
        nw, n, hid, b = nwh * nww, ws * ws, 2 * c, 4
        bnw = b * nw
        dt = jnp.bfloat16

        pa, pb = _mk_params(rng, c, hid), _mk_params(rng, c, hid)
        bias_a = jnp.asarray(rng.normal(0, 0.1, (nh, n, n)), jnp.float32)
        nb = nh * nw if shift else nh
        bias_b = jnp.asarray(rng.normal(0, 0.1, (nb, n, n)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 0.5, (bnw, n, c)), jnp.float32)
        x = x.astype(dt)
        if with_dpf:
            f = jnp.asarray(rng.choice([0.0, 1 / 0.9], (b, 4)), jnp.float32)
            dpf = jnp.repeat(f, nw * n, axis=0)
        else:
            dpf = None

        ipp, t = 2, 2 * nw
        geom = (ipp, nwh, nww, ws, shift)

        def oracle(x, pa, bias_a, pb, bias_b):
            fa = tuple(prep_block_params(list(pa), c, nh, dt))
            fb = tuple(prep_block_params(list(pb), c, nh, dt))
            ba = pack_bias_fast(bias_a, nh, n, dt)
            bb = pack_bias_fast(bias_b, nh, n, dt)
            xg = x.reshape(bnw // t, t * n, c)
            hm = head_mask_arr(nh, c, dt)
            so = seg_ones_arr(nh, n, dt)
            dg = (None if dpf is None
                  else dpf.reshape(bnw // t, t * n, 4))
            outs = [ptr._pair_ops(
                xg[i].astype(jnp.float32), dt, nh, t, n, c, nw, geom,
                fa, ba, fb, bb, hm, so,
                None if dg is None else dg[i]).astype(dt)
                for i in range(xg.shape[0])]
            return jnp.stack(outs).reshape(bnw, n, c)

        def kern(x, pa, bias_a, pb, bias_b):
            return ptr.fused_swin_pair_train(
                x, pa, bias_a, pb, bias_b, dpf, num_heads=nh,
                x_size=(h, w), window_size=ws, shift=shift,
                images_per_program=ipp, interpret=True)

        wout = jnp.asarray(rng.normal(0, 1, (bnw, n, c)), jnp.float32)

        def loss_of(fn):
            def l(*args):
                return jnp.sum(fn(*args).astype(jnp.float32) * wout)

            return l

        args = (x, pa, bias_a, pb, bias_b)
        y_o = np.asarray(oracle(*args), np.float32)
        y_k = np.asarray(kern(*args), np.float32)
        # elementwise, max-norm: the suite's persistent compilation
        # cache can hold executables compiled on a different host whose
        # vectorization rounds bf16 chains slightly differently, so an
        # exact-sum comparison is ill-conditioned
        assert (np.abs(y_o - y_k).max()
                < 1e-2 * max(1e-3, np.abs(y_o).max()))

        g_o = jax.grad(loss_of(oracle), argnums=tuple(range(5)))(*args)
        g_k = jax.grad(loss_of(kern), argnums=tuple(range(5)))(*args)
        for a, bgr in zip(jax.tree_util.tree_leaves(g_o),
                          jax.tree_util.tree_leaves(g_k)):
            a = np.asarray(a, np.float32)
            bgr = np.asarray(bgr, np.float32)
            denom = max(1e-6, float(np.abs(a).max()))
            assert float(np.abs(a - bgr).max()) / denom < 2e-2

    def test_grid_accumulation_matches_single_program(self, rng):
        """Weight grads summed across 4 grid programs (ipp=1) must equal
        the one-program (ipp=4) result — gates the revisited-block
        accumulation in the backward kernel."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels import pair_train as ptr

        c, nh, ws, shift = 12, 2, 4, 2
        h = w = 8
        nw, n, hid, b = 4, ws * ws, 2 * c, 4
        pa, pb = _mk_params(rng, c, hid), _mk_params(rng, c, hid)
        bias_a = jnp.asarray(rng.normal(0, 0.1, (nh, n, n)), jnp.float32)
        bias_b = jnp.asarray(rng.normal(0, 0.1, (nh * nw, n, n)),
                             jnp.float32)
        x = jnp.asarray(rng.normal(0, 0.5, (b * nw, n, c)),
                        jnp.bfloat16)

        def loss(ipp):
            def l(pa):
                y = ptr.fused_swin_pair_train(
                    x, pa, bias_a, pb, bias_b, None, num_heads=nh,
                    x_size=(h, w), window_size=ws, shift=shift,
                    images_per_program=ipp, interpret=True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            return l

        g1 = jax.grad(loss(1))(pa)
        g4 = jax.grad(loss(4))(pa)
        for a, bgr in zip(g1, g4):
            a = np.asarray(a, np.float32)
            bgr = np.asarray(bgr, np.float32)
            denom = max(1e-6, float(np.abs(a).max()))
            assert float(np.abs(a - bgr).max()) / denom < 2e-2


class TestBasicLayerTrainPath:
    def _layer_and_data(self, rng, dtype, drop_path=()):
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import BasicLayer

        b, h, w, c, nh, ws = 4, 16, 16, 12, 3, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        layer = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=ws,
                           mlp_ratio=2.0, build_resolution=(h, w),
                           drop_path=drop_path, dtype=dtype)
        return layer, x, (h, w)

    def test_train_grads_track_xla(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp

        layer, x, x_size = self._layer_and_data(rng, jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        monkeypatch.delenv("RDST_TPU_PALLAS_TRAIN", raising=False)
        params = layer.init(jax.random.PRNGKey(0), x, x_size)

        def loss(params, train_kernel):
            if train_kernel:
                monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "pair")
                monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
            else:
                monkeypatch.delenv("RDST_TPU_PALLAS_TRAIN", raising=False)
            y = layer.apply(params, x, x_size, False)
            return jnp.mean(y.astype(jnp.float32) ** 2)

        v_ref, g_ref = jax.value_and_grad(loss)(params, False)
        v_k, g_k = jax.value_and_grad(loss)(params, True)
        assert np.allclose(float(v_ref), float(v_k), rtol=2e-2)
        leaves_r = jax.tree_util.tree_leaves(g_ref)
        leaves_k = jax.tree_util.tree_leaves(g_k)
        gmax = max(float(np.abs(np.asarray(a, np.float32)).max())
                   for a in leaves_r)
        for a, bgr in zip(leaves_r, leaves_k):
            a = np.asarray(a, np.float32)
            bgr = np.asarray(bgr, np.float32)
            # bf16 fast-path math (folded affines, clamped exp, tanh
            # GELU) vs exact XLA: same tolerance class as the forward
            # parity gates, grads amplify bf16 noise a little. The
            # denominator floors at a fraction of the GLOBAL grad scale:
            # near-zero leaves carry absolute bf16 noise from O(1)
            # activations that a purely per-leaf relative test amplifies
            # (observed: 7e-5 absolute on a 6e-4-scale leaf with global
            # grad scale 1.2e-2 — ~0.6% of gmax, pure bf16 rounding)
            denom = max(1e-5, float(np.abs(a).max()), 0.12 * gmax)
            assert float(np.abs(a - bgr).max()) / denom < 0.08

    def test_droppath_runs_and_is_stochastic(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp

        layer, x, x_size = self._layer_and_data(rng, jnp.bfloat16,
                                                drop_path=(0.5, 0.5))
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = layer.init(jax.random.PRNGKey(0), x, x_size)
        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")

        def run(seed):
            def loss(p):
                y = layer.apply(p, x, x_size, False,
                                rngs={"droppath": jax.random.PRNGKey(seed)})
                return jnp.mean(y.astype(jnp.float32) ** 2)

            return jax.value_and_grad(loss)(params)

        v1, g1 = run(1)
        v2, g2 = run(2)
        assert np.isfinite(float(v1)) and np.isfinite(float(v2))
        assert float(v1) != float(v2)  # different draws -> different loss
        for leaf in jax.tree_util.tree_leaves(g1):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()

    def test_gate_engages_through_the_model_factory(self, monkeypatch):
        """A real generator (tiny RDST config) traced with
        pallas_train='pair' + bf16 must actually reach the train kernel
        — guards the whole gate chain (config -> env -> BasicLayer) so
        a gate regression can't silently fall back to XLA and pass the
        parity tests trivially."""
        import jax
        import jax.numpy as jnp

        import rdst_tpu.kernels.pair_train as ptr
        from rdst_tpu.config import ParametersLoader
        from rdst_tpu.models.registry import build_generator

        calls = {"n": 0}
        orig = ptr.fused_swin_pair_train

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        # nn/swin imports the symbol at call time, so patching the
        # module attribute is enough
        monkeypatch.setattr(ptr, "fused_swin_pair_train", spy)
        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")

        paras = ParametersLoader("config_files/rdst_tiny_oasis_x4.ini")
        model = build_generator(paras, dtype=jnp.bfloat16)
        x = jnp.ones((2, 16, 16, 1), jnp.bfloat16)
        params = jax.jit(model.init, static_argnames=("deterministic",))(
            jax.random.PRNGKey(0), x, deterministic=True)

        def loss(p):
            y = model.apply(p, x, deterministic=False,
                            rngs={"droppath": jax.random.PRNGKey(1)})
            return jnp.mean(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params)
        assert calls["n"] > 0, "pair train kernel never engaged"
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()

    def test_e2e_trainer_mesh_pair_kernel(self, tmp_path, monkeypatch):
        """Full-stack: config -> SRTrainer -> DP-sharded jitted step ->
        differentiable pair kernel, on the 8-device CPU mesh. Gates the
        production wiring (pallas_train config key, mesh registration,
        shard_map locality, custom-VJP backward) end to end."""
        import pathlib

        import jax

        import rdst_tpu.kernels.pair_train as ptr
        from rdst_tpu.config import ParametersLoader
        from rdst_tpu.data import synthetic
        from rdst_tpu.data.readers import make_train_valid_datasets
        from rdst_tpu.runners.trainer import SRTrainer

        calls = {"n": 0}
        orig = ptr.fused_swin_pair_train

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(ptr, "fused_swin_pair_train", spy)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")

        data = tmp_path / "OASIS" / "example"
        synthetic.make_oasis_example(str(data), shape=(40, 48, 24))
        repo = pathlib.Path(__file__).resolve().parents[1]
        p = ParametersLoader(
            str(repo / "config_files" / "rdst_tiny_oasis_x4.ini"))
        p.set("data_folder", str(data))
        p.set("output_dir", str(tmp_path / "outputs"))
        p.set("model_name", "RDST_TINY_PAIRTRAIN")
        p.set("patch_size", 8)
        p.set("batch_size", 8)  # divides the 8-device data axis
        p.set("rdst_embed_dim", 12)
        p.set("rdst_num_heads", [2, 2])
        p.set("rdst_window_size", [4, 4])
        p.set("rdst_dense_layer_depths", [2, 2])
        p.set("rdst_rdb_depths", [1, 1])
        p.set("rdst_growth_rate", 12)
        p.set("epochs_in_total", {"WarmUP": 2})
        p.set("check_every", 2)
        p.set("quick_eva_num_samples", 2)
        p.set("multi_threads", 1)
        p.set("training_dtype", "bfloat16")
        p.set("pallas_train", "pair")

        ds_train, ds_valid = make_train_valid_datasets(p)
        trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
        assert len(jax.devices()) == 8
        assert trainer.mesh.shape["data"] == 8
        trainer.setup()
        trainer.train()
        assert calls["n"] > 0, "train kernel never engaged in the step"
        log = (tmp_path / "outputs" / "RDST_TINY_PAIRTRAIN_None"
               / "training_log.txt").read_text()
        assert "Training complete" in log

    def test_f32_training_falls_back_to_xla(self, rng, monkeypatch):
        """The gate needs the bf16 fast path; f32 training must keep
        the plain autodiff path (and still differentiate)."""
        import jax
        import jax.numpy as jnp

        layer, x, x_size = self._layer_and_data(rng, jnp.float32)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = layer.init(jax.random.PRNGKey(0), x, x_size)
        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")

        def loss(p):
            y = layer.apply(p, x, x_size, False)
            return jnp.mean(y ** 2)

        g = jax.grad(loss)(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()

    def test_bf16_training_defaults_to_pair_kernel(self, tmp_path,
                                                   monkeypatch):
        """r4: the pair kernel won on hardware (BENCH_EXTRA record 9:
        33.9 vs 15.5 steps/s), so bf16 training defaults pallas_train
        to 'pair' when neither the config key nor the env says
        otherwise; f32 stays on XLA autodiff, and an explicit off key
        or env var wins over the default."""
        import os
        import pathlib

        from rdst_tpu.config import ParametersLoader
        from rdst_tpu.data import synthetic
        from rdst_tpu.data.readers import make_train_valid_datasets
        from rdst_tpu.runners.trainer import SRTrainer

        data = tmp_path / "OASIS" / "example"
        synthetic.make_oasis_example(str(data), shape=(40, 48, 24))
        repo = pathlib.Path(__file__).resolve().parents[1]

        def trainer_with(**keys):
            p = ParametersLoader(
                str(repo / "config_files" / "rdst_tiny_oasis_x4.ini"))
            p.set("data_folder", str(data))
            p.set("output_dir", str(tmp_path / "outputs"))
            p.set("multi_threads", 1)
            for k, v in keys.items():
                p.set(k, v)
            ds_train, ds_valid = make_train_valid_datasets(p)
            return SRTrainer(p, ds_train, ds_valid, seed=0)

        monkeypatch.delenv("RDST_TPU_PALLAS_TRAIN", raising=False)
        trainer_with(training_dtype="bfloat16")
        assert os.environ.get("RDST_TPU_PALLAS_TRAIN") == "pair"

        monkeypatch.delenv("RDST_TPU_PALLAS_TRAIN", raising=False)
        trainer_with()  # f32 default: no kernel
        assert "RDST_TPU_PALLAS_TRAIN" not in os.environ

        monkeypatch.delenv("RDST_TPU_PALLAS_TRAIN", raising=False)
        trainer_with(training_dtype="bfloat16", pallas_train="off")
        assert "RDST_TPU_PALLAS_TRAIN" not in os.environ

        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "0")
        trainer_with(training_dtype="bfloat16")  # env opt-out respected
        assert os.environ.get("RDST_TPU_PALLAS_TRAIN") == "0"
