"""Differentiable single-block Swin kernel (kernels/block_train.py, r5):
the C>=180 training path the pair kernel cannot hold (VERDICT r4 #6).

Gating layers mirror test_pair_train.py:
* kernel vs oracle — jax.grad of the IDENTICAL math (`_block_ops` on
  arrays) must match the custom_vjp's Pallas backward near-exactly;
* chunked grid vs whole-image — the window-chunked bias-grad
  accumulation (the novel resident-buffer scheme) must be invisible;
* model vs XLA — SwinTransformerBlock grads through the train kernel
  must track plain XLA autodiff within bf16 fast-path tolerance;
* admission — SwinIR-std's real training geometry (C=180) must ADMIT
  this kernel while the pair kernel self-gates off, and the BasicLayer
  fallback must engage it without any config change.
"""

import numpy as np
import pytest


@pytest.fixture()
def rng():
    """Locally-seeded: tolerances are calibrated on fixed data."""
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


class TestBlockTrainKernel:
    @pytest.mark.parametrize("per_window_bias,with_dpf",
                             [(False, False), (True, False), (True, True)])
    def test_grad_parity_vs_oracle(self, rng, per_window_bias, with_dpf):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels import block_train as btr
        from rdst_tpu.kernels.swin_block import (head_mask_arr,
                                                 pack_bias_fast,
                                                 prep_block_params,
                                                 seg_ones_arr)

        c, nh, ws = 12, 2, 4
        nw, n, hid, b = 4, ws * ws, 2 * c, 4
        bnw = b * nw
        dt = jnp.bfloat16

        p = _mk_params(rng, c, hid)
        nb = nh * nw if per_window_bias else nh
        bias = jnp.asarray(rng.normal(0, 0.1, (nb, n, n)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 0.5, (bnw, n, c)), jnp.float32)
        x = x.astype(dt)
        if with_dpf:
            f = jnp.asarray(rng.choice([0.0, 1 / 0.9], (b, 2)), jnp.float32)
            dpf = jnp.repeat(f, nw * n, axis=0)
        else:
            dpf = None

        def oracle(x, p, bias):
            f = tuple(prep_block_params(list(p), c, nh, dt))
            bpk = pack_bias_fast(bias, nh, n, dt)
            t = nw  # one image per program (the impl default at ipp=1)
            xg = x.reshape(bnw // t, t * n, c)
            hm = head_mask_arr(nh, c, dt)
            so = seg_ones_arr(nh, n, dt)
            dg = None if dpf is None else dpf.reshape(bnw // t, t * n, 2)
            outs = [btr._block_ops(
                xg[i].astype(jnp.float32), dt, nh, t, n, c, bpk.shape[0],
                f, bpk, hm, so, None if dg is None else dg[i]).astype(dt)
                for i in range(xg.shape[0])]
            return jnp.stack(outs).reshape(bnw, n, c)

        def kern(x, p, bias):
            return btr.fused_swin_block_train(
                x, p, bias, dpf, num_heads=nh, windows_per_image=nw,
                images_per_program=1, interpret=True)

        wout = jnp.asarray(rng.normal(0, 1, (bnw, n, c)), jnp.float32)

        def loss_of(fn):
            def l(*args):
                return jnp.sum(fn(*args).astype(jnp.float32) * wout)

            return l

        args = (x, p, bias)
        y_o = np.asarray(oracle(*args), np.float32)
        y_k = np.asarray(kern(*args), np.float32)
        assert (np.abs(y_o - y_k).max()
                < 1e-2 * max(1e-3, np.abs(y_o).max()))

        g_o = jax.grad(loss_of(oracle), argnums=(0, 1, 2))(*args)
        g_k = jax.grad(loss_of(kern), argnums=(0, 1, 2))(*args)
        for a, bgr in zip(jax.tree_util.tree_leaves(g_o),
                          jax.tree_util.tree_leaves(g_k)):
            a = np.asarray(a, np.float32)
            bgr = np.asarray(bgr, np.float32)
            denom = max(1e-6, float(np.abs(a).max()))
            assert float(np.abs(a - bgr).max()) / denom < 2e-2

    def test_chunked_grid_matches_whole_image(self, rng, monkeypatch):
        """Shrink the VMEM budget until the geometry only admits window
        CHUNKS (t < nW): grads must match the whole-image grid — gates
        the resident bias-grad buffer accumulating tiles at chunk
        offsets across grid revisits (the scheme pair_train never
        needed)."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels import block_train as btr

        c, nh, ws = 12, 2, 4
        nw, n, hid, b = 4, ws * ws, 2 * c, 2
        p = _mk_params(rng, c, hid)
        # per-window bias (the shifted-block case): its gradient tiles
        # land at per-chunk row offsets — the hard case
        bias = jnp.asarray(rng.normal(0, 0.1, (nh * nw, n, n)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 0.5, (b * nw, n, c)), jnp.bfloat16)

        def grads():
            def l(p, bias):
                y = btr.fused_swin_block_train(
                    x, p, bias, None, num_heads=nh, windows_per_image=nw,
                    images_per_program=1, interpret=True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            return jax.grad(l, argnums=(0, 1))(p, bias)

        g_whole = grads()
        geom_whole = btr._chunk_geometry(b * nw, nw, n, c, nh, hid, 2,
                                         nh * nw, 1)
        assert geom_whole[0] == nw  # sanity: default grid is whole-image

        # budget just above the floor: db buffer + 6x one-window set
        db_bytes = nh * nw * n * (-(-(nh * n) // 128) * 128) * 4
        from rdst_tpu.kernels.swin_block import _vmem_estimate

        floor = (btr._TRAIN_VMEM_FACTOR
                 * _vmem_estimate(1, n, c, nh, hid, 1, 2, True) + db_bytes)
        monkeypatch.setattr(btr, "_TRAIN_VMEM_BUDGET", int(floor * 1.9))
        geom_chunk = btr._chunk_geometry(b * nw, nw, n, c, nh, hid, 2,
                                         nh * nw, 1)
        assert geom_chunk is not None and geom_chunk[0] < nw
        assert geom_chunk[2] > 1  # several chunks share one image's bias
        g_chunk = grads()

        for a, bgr in zip(jax.tree_util.tree_leaves(g_whole),
                          jax.tree_util.tree_leaves(g_chunk)):
            a = np.asarray(a, np.float32)
            bgr = np.asarray(bgr, np.float32)
            denom = max(1e-6, float(np.abs(a).max()))
            assert float(np.abs(a - bgr).max()) / denom < 2e-2

    def test_admission_at_swinir_std_geometry(self):
        """The whole point: SwinIR-std's training geometry (C=180,
        hidden=360, 48x48 patch, ws=8 -> nW=36, N=64) must REJECT the
        pair kernel (its r4 self-gate, PERF.md:318-323) yet ADMIT the
        single-block window-chunked kernel."""
        from rdst_tpu.kernels.block_train import fused_block_train_fits
        from rdst_tpu.kernels.pair_train import fused_pair_train_fits

        nw, n, c, nh, hid, es = 36, 64, 180, 6, 360, 2
        assert not fused_pair_train_fits(nw, n, c, nh, hid, es)
        assert fused_block_train_fits(nw, n, c, nh, hid, es)
        # W96's geometry too (C=96, hidden=192: the other big config)
        assert fused_block_train_fits(36, 64, 96, 6, 192, 2)
        # f32 never admits (bf16 fast path only)
        assert not fused_block_train_fits(nw, n, c, nh, hid, 4)


class TestBlockTrainModelPath:
    def _layer_and_data(self, rng, dtype, drop_path=()):
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import BasicLayer

        b, h, w, c, nh, ws = 4, 16, 16, 12, 3, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        layer = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=ws,
                           mlp_ratio=2.0, build_resolution=(h, w),
                           drop_path=drop_path, dtype=dtype)
        return layer, x, (h, w)

    def test_block_mode_grads_track_xla(self, rng, monkeypatch):
        """pallas_train='block' forces single-block granularity even
        where pairs fit; grads must track plain XLA autodiff."""
        import jax
        import jax.numpy as jnp

        layer, x, x_size = self._layer_and_data(rng, jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        monkeypatch.delenv("RDST_TPU_PALLAS_TRAIN", raising=False)
        params = layer.init(jax.random.PRNGKey(0), x, x_size)

        def loss(params, train_kernel):
            if train_kernel:
                monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "block")
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
            # same tolerance class as the pair-train model gate (bf16
            # fast-path math vs exact XLA; absolute floor for near-zero
            # leaves at a fraction of the global grad scale)
            denom = max(1e-5, float(np.abs(a).max()), 0.12 * gmax)
            assert float(np.abs(a - bgr).max()) / denom < 0.08

    def test_pair_mode_falls_back_to_block_when_pair_rejects(
            self, rng, monkeypatch):
        """The production path for SwinIR-std: pallas_train='pair' (the
        bf16 default) with the PAIR kernel self-gated off must engage
        the single-block kernel per block — no config change needed."""
        import jax
        import jax.numpy as jnp

        import rdst_tpu.kernels.block_train as btr
        import rdst_tpu.kernels.pair_train as ptr

        layer, x, x_size = self._layer_and_data(rng, jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        monkeypatch.delenv("RDST_TPU_PALLAS_TRAIN", raising=False)
        params = layer.init(jax.random.PRNGKey(0), x, x_size)

        monkeypatch.setattr(ptr, "fused_pair_train_fits",
                            lambda *a, **k: False)
        calls = {"n": 0}
        orig = btr.fused_swin_block_train

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(btr, "fused_swin_block_train", spy)
        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")

        def loss(p):
            y = layer.apply(p, x, x_size, False)
            return jnp.mean(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params)
        assert calls["n"] == 2, "one call per block of the depth-2 layer"
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()

    def test_droppath_runs_and_is_stochastic(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp

        layer, x, x_size = self._layer_and_data(rng, jnp.bfloat16,
                                                drop_path=(0.5, 0.5))
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = layer.init(jax.random.PRNGKey(0), x, x_size)
        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "block")
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
        assert float(v1) != float(v2)
        for leaf in jax.tree_util.tree_leaves(g1):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()

    def test_f32_training_keeps_xla(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp

        import rdst_tpu.kernels.block_train as btr

        layer, x, x_size = self._layer_and_data(rng, jnp.float32)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = layer.init(jax.random.PRNGKey(0), x, x_size)
        monkeypatch.setenv("RDST_TPU_PALLAS_TRAIN", "block")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setattr(
            btr, "fused_swin_block_train",
            lambda *a, **k: (_ for _ in ()).throw(
                AssertionError("block kernel engaged for f32")))

        def loss(p):
            y = layer.apply(p, x, x_size, False)
            return jnp.mean(y ** 2)

        g = jax.grad(loss)(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()
