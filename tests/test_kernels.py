"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest


class TestPallasModeDispatch:
    """Modes '1'/'block' were retired in r3 (twice-measured negative —
    PERF.md); requesting them must still run and hit the XLA path."""

    @pytest.mark.parametrize("mode", ["1", "block"])
    def test_retired_modes_fall_through_to_xla(self, rng, monkeypatch, mode):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import BasicLayer

        b, h, w, c, nh, ws = 1, 16, 16, 12, 3, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        layer = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=ws,
                           mlp_ratio=2.0, build_resolution=(h, w))
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = layer.init(jax.random.PRNGKey(0), x, (h, w))
        ref = np.asarray(layer.apply(params, x, (h, w)))
        monkeypatch.setenv("RDST_TPU_PALLAS", mode)
        got = np.asarray(layer.apply(params, x, (h, w)))
        assert np.array_equal(got, ref)


class TestExportKernelFlags:
    """Config keys pallas_kernels/pallas_quant -> trace-time env gates
    (runners call this before build_generator). Present key wins over
    an inherited env value; absent key leaves the env untouched so
    tools/kernel_sweep.py keeps driving the env per point."""

    def test_present_keys_win_over_env(self, monkeypatch):
        import os

        from rdst_tpu.kernels.window_attention import (export_kernel_flags,
                                                       pallas_mode)
        from rdst_tpu.kernels.swin_block import quant_flags

        monkeypatch.setenv("RDST_TPU_PALLAS", "pack")
        monkeypatch.setenv("RDST_TPU_PALLAS_QUANT", "all")
        export_kernel_flags({"pallas_kernels": "swin",
                             "pallas_quant": "qkv,mlp"})
        assert os.environ["RDST_TPU_PALLAS"] == "swin"
        assert pallas_mode() == "swin"
        assert quant_flags() == frozenset(("qkv", "mlp"))

    def test_absent_keys_leave_env_untouched(self, monkeypatch):
        import os

        from rdst_tpu.kernels.window_attention import export_kernel_flags

        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        monkeypatch.delenv("RDST_TPU_PALLAS_QUANT", raising=False)
        export_kernel_flags({})
        assert os.environ["RDST_TPU_PALLAS"] == "pair"
        assert "RDST_TPU_PALLAS_QUANT" not in os.environ

    def test_off_values_export_explicit_off(self, monkeypatch):
        from rdst_tpu.kernels.window_attention import (export_kernel_flags,
                                                       pallas_mode)
        from rdst_tpu.kernels.swin_block import quant_flags

        monkeypatch.setenv("RDST_TPU_PALLAS", "rdstb")
        monkeypatch.setenv("RDST_TPU_PALLAS_QUANT", "qkv")
        export_kernel_flags({"pallas_kernels": "off", "pallas_quant": "none"})
        assert pallas_mode() == ""
        assert quant_flags() == frozenset()

    def test_shipped_swinir_std_config_engages_int8_qkv(self, monkeypatch):
        """The C=180 config ships the measured int8-qkv win (PERF.md)."""
        from rdst_tpu.config import ParametersLoader
        from rdst_tpu.kernels.window_attention import (export_kernel_flags,
                                                       pallas_mode)
        from rdst_tpu.kernels.swin_block import quant_flags

        # setenv (not delenv) so monkeypatch records a restore point:
        # export_kernel_flags writes os.environ directly and the values
        # must NOT outlive this test (they'd contaminate the suite)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        monkeypatch.setenv("RDST_TPU_PALLAS_QUANT", "")
        paras = ParametersLoader(
            "config_files/swinir_std_40k_oasis20_x4.ini")
        assert str(paras.get("inference_dtype")).lower() == "bfloat16"
        export_kernel_flags(paras)
        assert pallas_mode() == "swin"
        assert quant_flags() == frozenset(("qkv",))


class TestFusedSwinBlock:
    """Whole-block kernel (kernels/swin_block.py) vs the XLA path."""

    @pytest.mark.parametrize("shift,ipp", [(0, 1), (4, 1), (0, 2), (4, 4)])
    def test_block_parity_and_tree(self, rng, shift, ipp, monkeypatch):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import SwinTransformerBlock

        b, h, w, c, nh, ws = 4, 16, 24, 12, 3, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        blk = SwinTransformerBlock(dim=c, num_heads=nh, window_size=ws,
                                   shift_size=shift, mlp_ratio=2.0,
                                   build_resolution=(h, w))
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = blk.init(jax.random.PRNGKey(0), x, (h, w))
        ref = blk.apply(params, x, (h, w))

        monkeypatch.setenv("RDST_TPU_PALLAS", "swin")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS_IPP", str(ipp))
        p2 = blk.init(jax.random.PRNGKey(0), x, (h, w))
        # identical parameter tree (checkpoint compatibility)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))
        got = blk.apply(params, x, (h, w))
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 2e-5

    @pytest.mark.parametrize("shift", [0, 4])
    def test_large_logit_stability(self, rng, shift, monkeypatch):
        """r4 regression: the 100k-schedule run grew attention logits to
        ~227 (40k recipe: ~25); the legacy clamp-at-60 fast path then
        silently flattens attention (and went NaN on the chip). The
        default segment-stable softmax must track the f32 XLA path at
        ANY logit magnitude. Logits are inflated by scaling the qkv
        kernel so q·k products land in the 150-300 range."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import SwinTransformerBlock

        b, h, w, c, nh, ws = 2, 16, 16, 12, 3, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        blk = SwinTransformerBlock(dim=c, num_heads=nh, window_size=ws,
                                   shift_size=shift, mlp_ratio=2.0,
                                   build_resolution=(h, w),
                                   dtype=jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = blk.init(jax.random.PRNGKey(0), x, (h, w))
        qkv = params["params"]["attn"]["qkv"]["kernel"]
        # logit magnitude grows quadratically in the qkv scale: x9 gives
        # max|logit| ~2.7, x80 ~210 — the regime the 100k run reached
        params["params"]["attn"]["qkv"]["kernel"] = qkv * 80.0
        ref = np.asarray(
            blk.apply(params, x, (h, w)), np.float32)
        assert np.isfinite(ref).all()

        from rdst_tpu.kernels import clear_kernel_caches

        monkeypatch.setenv("RDST_TPU_PALLAS", "swin")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        clear_kernel_caches()
        got = np.asarray(blk.apply(params, x, (h, w)), np.float32)
        assert np.isfinite(got).all()
        # bf16 fast path vs bf16 XLA: only rounding noise may remain —
        # the old clamp variant fails this with O(0.1) attention error
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert err < 0.05, err

        # stable_bc (r5 stretch: one full-lane exp over broadcast
        # maxes) is exact like stable — must pass the same gate
        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "stable_bc")
        clear_kernel_caches()
        got_bc = np.asarray(blk.apply(params, x, (h, w)), np.float32)
        assert np.isfinite(got_bc).all()
        err_bc = np.abs(got_bc - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert err_bc < 0.05, err_bc

        # the opt-in clamp variant demonstrably corrupts at this scale
        # (documents WHY stable is the default; uses a fresh cache)
        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "clamp")
        clear_kernel_caches()
        got_clamp = np.asarray(blk.apply(params, x, (h, w)), np.float32)
        clamp_err = np.abs(got_clamp - ref).max() / np.abs(ref).max()
        monkeypatch.delenv("RDST_TPU_PALLAS_SOFTMAX")
        clear_kernel_caches()
        assert clamp_err > err  # stable strictly better here

    def test_fast_path_folded_weights_parity(self, rng):
        """bf16 fast path (packed attention + LN-affine/scale folds) vs
        the f32 precise path, both in interpret mode. Gates the
        trace-time weight folding algebra."""
        import jax.numpy as jnp

        from rdst_tpu.kernels.swin_block import fused_swin_block

        nw, n, c, nh, hid = 4, 64, 24, 3, 48
        t = nw * 2  # 2 images
        def arr(*s, scale=1.0):
            return jnp.asarray(rng.normal(0, scale, s), jnp.float32)

        x = arr(t, n, c)
        wqkv, bqkv = arr(c, 3 * c, scale=c ** -0.5), arr(3 * c, scale=0.1)
        wproj, bproj = arr(c, c, scale=c ** -0.5), arr(c, scale=0.1)
        g1, b1 = 1 + 0.1 * arr(c), 0.1 * arr(c)
        g2, b2 = 1 + 0.1 * arr(c), 0.1 * arr(c)
        w1, bf1 = arr(c, hid, scale=c ** -0.5), arr(hid, scale=0.1)
        w2, bf2 = arr(hid, c, scale=hid ** -0.5), arr(c, scale=0.1)
        bias = arr(nh * nw, n, n, scale=0.5)

        args = (wqkv, bqkv, wproj, bproj, g1, b1, g2, b2, w1, bf1, w2, bf2)
        ref = fused_swin_block(  # f32 => precise path, no folds
            x, *args, bias=bias, num_heads=nh, windows_per_image=nw,
            interpret=True)
        got = fused_swin_block(  # bf16 => fast path with folded weights
            x.astype(jnp.bfloat16),
            *[a.astype(jnp.bfloat16) for a in args],
            bias=bias.astype(jnp.bfloat16), num_heads=nh,
            windows_per_image=nw, interpret=True)
        ref = np.asarray(ref, np.float32)
        got = np.asarray(got, np.float32)
        # bf16-limited agreement; folding must not add systematic error
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.05
        assert np.abs(got - ref).mean() / denom < 0.005

    def test_compact_bias_unshifted(self, rng, monkeypatch):
        """Unshifted blocks may pass the (nH, N, N) shared bias instead of
        broadcasting it per window; output must be identical."""
        import jax.numpy as jnp

        from rdst_tpu.kernels.swin_block import fused_swin_block

        nw, n, c, nh, hid = 4, 64, 24, 3, 48
        t = nw * 2
        def arr(*s, scale=1.0):
            return jnp.asarray(rng.normal(0, scale, s), jnp.float32)

        x = arr(t, n, c)
        args = (arr(c, 3 * c, scale=c ** -0.5), arr(3 * c, scale=0.1),
                arr(c, c, scale=c ** -0.5), arr(c, scale=0.1),
                1 + 0.1 * arr(c), 0.1 * arr(c), 1 + 0.1 * arr(c),
                0.1 * arr(c), arr(c, hid, scale=c ** -0.5),
                arr(hid, scale=0.1), arr(hid, c, scale=hid ** -0.5),
                arr(c, scale=0.1))
        bias1 = arr(nh, n, n, scale=0.5)
        biasn = jnp.broadcast_to(bias1[:, None], (nh, nw, n, n)
                                 ).reshape(nh * nw, n, n)
        kw = dict(num_heads=nh, windows_per_image=nw, interpret=True)
        want = fused_swin_block(x, *args, bias=biasn, **kw)
        got = fused_swin_block(x, *args, bias=bias1, **kw)
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_erf_polynomial(self):
        import math

        from rdst_tpu.kernels.swin_block import _erf

        xs = np.linspace(-4, 4, 201).astype(np.float32)
        want = np.array([math.erf(v) for v in xs])
        got = np.asarray(_erf(xs))
        assert np.abs(got - want).max() < 1e-6

    def test_vmem_fit_gate(self):
        from rdst_tpu.kernels.swin_block import fused_block_fits

        # RDST-E1 bench shape fits whole-image
        assert fused_block_fits(20, 64, 120, 6, 240, 2)
        # a 256x256 SwinIR whole-slice overflows whole-image VMEM but the
        # bf16 fast path runs it window-chunked; f32 cannot chunk
        assert fused_block_fits(1024, 64, 180, 6, 360, 2)
        assert not fused_block_fits(1024, 64, 180, 6, 360, 4)

    @pytest.mark.parametrize("shift", [0, 4])
    def test_chunked_grid_parity(self, rng, shift, monkeypatch):
        """A 'large image' forced through the window-chunked grid (tiny
        VMEM budget) matches the whole-image fast path exactly —
        including the per-chunk shift-mask bias slices."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels import swin_block as sb
        from rdst_tpu.nn.swin import SwinTransformerBlock

        b, h, w, c, nh, ws = 1, 32, 32, 12, 3, 8  # nW = 16 windows
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.bfloat16)
        blk = SwinTransformerBlock(dim=c, num_heads=nh, window_size=ws,
                                   shift_size=shift, mlp_ratio=2.0,
                                   build_resolution=(h, w),
                                   dtype=jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS", "swin")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        params = blk.init(jax.random.PRNGKey(0), x, (h, w))
        want = np.asarray(blk.apply(params, x, (h, w)), np.float32)

        # shrink the budget so only sub-image chunks "fit"; the jit cache
        # must be dropped or the whole-image trace keeps serving (the
        # budget is read at trace time)
        full = sb._vmem_estimate(16, ws * ws, c, nh, 2 * c, 16, 2, True)
        quarter = sb._vmem_estimate(4, ws * ws, c, nh, 2 * c, 4, 2, True)
        assert quarter < full
        monkeypatch.setattr(sb, "_VMEM_BUDGET", (quarter + full) / 2)
        sb.fused_swin_block.clear_cache()
        try:
            got = np.asarray(blk.apply(params, x, (h, w)), np.float32)
        finally:
            sb.fused_swin_block.clear_cache()  # drop the chunked traces
        assert np.array_equal(got, want)


class TestWindowPacking:
    """pack=2: two windows per lane row (2nH virtual heads over 2C,
    block-diagonal weights, segment-LN)."""

    @pytest.mark.parametrize("shift", [0, 4])
    def test_pack_matches_unpacked_and_f32(self, rng, shift, monkeypatch):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import SwinTransformerBlock

        b, h, w, c, nh, ws = 2, 16, 24, 12, 3, 8  # nW = 6 (even)
        xf = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        blk32 = SwinTransformerBlock(dim=c, num_heads=nh, window_size=ws,
                                     shift_size=shift, mlp_ratio=2.0,
                                     build_resolution=(h, w))
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        params = blk32.init(jax.random.PRNGKey(0), xf, (h, w))
        ref32 = np.asarray(blk32.apply(params, xf, (h, w)))

        blk16 = SwinTransformerBlock(dim=c, num_heads=nh, window_size=ws,
                                     shift_size=shift, mlp_ratio=2.0,
                                     build_resolution=(h, w),
                                     dtype=jnp.bfloat16)
        x16 = xf.astype(jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS", "swin")
        base = np.asarray(blk16.apply(params, x16, (h, w)), np.float32)
        monkeypatch.setenv("RDST_TPU_PALLAS", "pack")
        got = np.asarray(blk16.apply(params, x16, (h, w)), np.float32)

        denom = np.abs(ref32).max()
        # packing must agree with the unpacked fast path to bf16 noise
        assert np.abs(got - base).max() / denom < 0.02
        # and carry no systematic error vs the f32 reference
        assert np.abs(got - ref32).max() / denom < 0.05
        assert np.abs(got - ref32).mean() / denom < 0.005

    def test_segment_normalize(self, rng):
        """nseg=2 segment-LN == plain LN applied to each half."""
        import jax.numpy as jnp

        from rdst_tpu.kernels.swin_block import _normalize

        x = jnp.asarray(rng.normal(2, 3, (32, 24)), jnp.float32)
        got = np.asarray(_normalize(x, nseg=2))
        want = np.concatenate([np.asarray(_normalize(x[:, :12])),
                               np.asarray(_normalize(x[:, 12:]))], axis=1)
        assert np.abs(got - want).max() < 1e-5


class TestFusedRDSTB:
    """Whole-RDSTB mega-kernel (kernels/rdstb_block.py)."""

    def _mk(self, dtype, pre_norm=False, h=16, w=24):
        import jax.numpy as jnp

        from rdst_tpu.models.rdst import RDSTB

        return RDSTB(input_dim=12, layer_depth=2, num_heads=3,
                     window_size=8, mlp_ratio=2.0, growth_rate=6,
                     num_blocks=3, pre_norm=pre_norm,
                     build_resolution=(h, w), dtype=dtype)

    @pytest.mark.parametrize("pre_norm", [False, True])
    def test_matches_pair_mode_and_f32(self, rng, monkeypatch, pre_norm):
        import jax
        import jax.numpy as jnp

        h, w, c0 = 16, 24, 12
        xf = jnp.asarray(rng.normal(0, 0.5, (2, h * w, c0)), jnp.float32)
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        blk32 = self._mk(jnp.float32, pre_norm)
        params = blk32.init(jax.random.PRNGKey(0), xf, (h, w))
        ref32 = np.asarray(blk32.apply(params, xf, (h, w)))

        blk16 = self._mk(jnp.bfloat16, pre_norm)
        x16 = xf.astype(jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        base = np.asarray(blk16.apply(params, x16, (h, w)), np.float32)
        monkeypatch.setenv("RDST_TPU_PALLAS", "rdstb")
        p2 = blk16.init(jax.random.PRNGKey(0), x16, (h, w))
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))
        got = np.asarray(blk16.apply(params, x16, (h, w)), np.float32)

        denom = np.abs(ref32).max()
        # same fast-path math as pair mode up to where intermediates
        # round (adapters run f32 in-kernel) — bf16-noise agreement
        assert np.abs(got - base).max() / denom < 0.02
        # and no systematic error vs the f32 reference
        assert np.abs(got - ref32).max() / denom < 0.05
        assert np.abs(got - ref32).mean() / denom < 0.005

    def test_full_rdst_model_rdstb_mode(self, rng, monkeypatch):
        """Whole RDSTSR forward dispatches the mega-kernel per RDSTB."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models.rdst import RDSTSR

        model = RDSTSR(in_chans=1, sr_scale=2, embed_dim=12,
                       dense_layer_depths=(2, 2), num_heads=(3, 3),
                       window_size=(8, 8), rdb_depths=(2, 2), mlp_ratio=2.0,
                       growth_rate=6, build_resolution=(16, 16),
                       dtype=jnp.bfloat16)
        x = jnp.asarray(rng.normal(0, 0.3, (1, 16, 16, 1)), jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        params = model.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(model.apply(params, x), np.float32)
        monkeypatch.setenv("RDST_TPU_PALLAS", "rdstb")
        got = np.asarray(model.apply(params, x), np.float32)
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.02

    @pytest.mark.parametrize("groups", ["qkv", "mlp,proj", "conv", "all"])
    def test_int8_quant_tracks_bf16(self, rng, monkeypatch, groups):
        """RDST_TPU_PALLAS_QUANT int8 matmul groups: the quantized
        mega-kernel must track the bf16 kernel within int8 noise
        (throughput/quality trade measured on hardware — PERF.md)."""
        import jax
        import jax.numpy as jnp

        h, w, c0 = 16, 24, 12
        xf = jnp.asarray(rng.normal(0, 0.5, (2, h * w, c0)), jnp.float32)
        x16 = xf.astype(jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS", "rdstb")
        blk = self._mk(jnp.bfloat16)
        params = blk.init(jax.random.PRNGKey(0), x16, (h, w))
        base = np.asarray(blk.apply(params, x16, (h, w)), np.float32)

        from rdst_tpu.kernels import rdstb_block

        monkeypatch.setenv("RDST_TPU_PALLAS_QUANT", groups)
        rdstb_block.fused_rdstb.clear_cache()
        got = np.asarray(blk.apply(params, x16, (h, w)), np.float32)
        rdstb_block.fused_rdstb.clear_cache()

        denom = np.abs(base).max()
        err = np.abs(got - base).max() / denom
        assert err < 0.06, (groups, err)  # int8 noise, not a wrong path
        assert err > 0, "quant path must actually engage"

    @pytest.mark.parametrize("prenorm", [True, False])
    def test_probe_args_match_kernel_contract(self, monkeypatch, prenorm):
        """fused_rdstb_probe's dummy operands must trace through the
        mega-kernel for BOTH adapter layouts — a shape drift there
        silently disables the kernel on hardware (the prenorm adapter
        affine is C-sized, not growth-sized; regression for the r3 bug
        that pinned the flagship to the pair fallback)."""
        import jax.numpy as jnp

        from rdst_tpu.kernels.rdstb_block import fused_rdstb, probe_args

        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        x, dstls, ck, cb = probe_args((16, 24), 8, 4, 12, 6, 2, 3, 2.0,
                                      prenorm, 1)
        out = fused_rdstb(
            x, dstls, ck, cb, num_heads=3, x_size=(16, 24), window_size=8,
            shift=4, growth=6, adapter_prenorm=prenorm,
            images_per_program=1, interpret=True, quant=frozenset())
        assert out.shape == x.shape

    def test_probe_lowers_the_jitted_impl(self, monkeypatch):
        """The probe must reach .lower().compile() on the JITTED impl.
        Regression: when the public fused_rdstb became a plain-function
        DP shim, the probe's fused_rdstb.lower() raised AttributeError,
        the broad except swallowed it, and the probe permanently
        returned False — silently pinning real-TPU inference to the
        pair fallback."""
        from rdst_tpu.kernels import rdstb_block as rb

        calls = {}

        class FakeLowered:
            def compile(self):
                calls["compiled"] = True

        class FakeJit:
            def lower(self, *a, **k):
                calls["lowered"] = True
                return FakeLowered()

        monkeypatch.setattr(rb, "_fused_rdstb_impl", FakeJit())
        monkeypatch.setattr(rb, "_PROBE_CACHE", {})
        ok = rb.fused_rdstb_probe((16, 16), 4, 2, 12, 12, 1, 2, 2.0,
                                  False, quant=frozenset())
        assert ok and calls.get("lowered") and calls.get("compiled")

    def test_conv3x3_matches_xla(self, rng):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels.rdstb_block import _conv3x3

        ipp, h, w, cin, cout = 2, 8, 12, 10, 6
        img = jnp.asarray(rng.normal(0, 1, (ipp, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
        want = jax.lax.conv_general_dilated(
            img, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = _conv3x3(img, k.reshape(9 * cin, cout), b.reshape(1, cout),
                       cin, cout).reshape(ipp, h, w, cout)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-4


class TestFusedSwinPair:
    """DSTL-pair kernel: both blocks + the in-VMEM shift relayout."""

    def test_shift_relayout_matches_xla_glue(self, rng):
        """_shift_relayout == window_reverse -> roll(-s,-s) ->
        window_partition, the exact glue XLA runs between the blocks."""
        import jax.numpy as jnp

        from rdst_tpu.kernels.swin_block import _shift_relayout
        from rdst_tpu.nn.swin import window_partition

        ipp, nwh, nww, ws, s, c = 2, 3, 2, 8, 4, 12
        h, w = nwh * ws, nww * ws
        x = jnp.asarray(rng.normal(0, 1, (ipp, h, w, c)), jnp.float32)
        wins = window_partition(x, ws).reshape(-1, c)
        got = _shift_relayout(wins, ipp, nwh, nww, ws, s)
        want = window_partition(
            jnp.roll(x, (-s, -s), (1, 2)), ws).reshape(-1, c)
        assert np.array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("ipp", [1, 2])
    def test_pair_matches_sequential_fused_blocks(self, rng, monkeypatch,
                                                  ipp):
        """BasicLayer depth-2 in pair mode vs the per-block fused path:
        same kernel math and bf16 intermediate rounding, so agreement is
        bf16-ulp-tight (XLA may fuse the glue around the two jitted
        programs differently, so exact bitwise equality is not
        guaranteed across geometries); the parameter trees must be
        identical."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import BasicLayer

        b, h, w, c, nh, ws = 2, 16, 24, 12, 3, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.bfloat16)
        layer = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=ws,
                           mlp_ratio=2.0, build_resolution=(h, w),
                           dtype=jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS_IPP", str(ipp))

        monkeypatch.setenv("RDST_TPU_PALLAS", "swin")
        params = layer.init(jax.random.PRNGKey(0), x, (h, w))
        ref = np.asarray(layer.apply(params, x, (h, w)), np.float32)

        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        p2 = layer.init(jax.random.PRNGKey(0), x, (h, w))
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2))
        got = np.asarray(layer.apply(params, x, (h, w)), np.float32)
        assert np.abs(got - ref).max() <= 1e-3 * np.abs(ref).max()

    @pytest.mark.parametrize("mode", ["swin", "pair"])
    def test_int8_quant_tracks_bf16(self, rng, monkeypatch, mode):
        """RDST_TPU_PALLAS_QUANT on the single-block and pair kernels:
        the int8 matmul groups must track the bf16 kernels within int8
        noise and must actually engage (same contract as the RDSTB
        mega-kernel's quant test)."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import BasicLayer

        b, h, w, c, nh, ws = 2, 16, 24, 12, 3, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.bfloat16)
        layer = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=ws,
                           mlp_ratio=2.0, build_resolution=(h, w),
                           dtype=jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS", mode)
        params = layer.init(jax.random.PRNGKey(0), x, (h, w))
        base = np.asarray(layer.apply(params, x, (h, w)), np.float32)

        monkeypatch.setenv("RDST_TPU_PALLAS_QUANT", "qkv,mlp,proj")
        got = np.asarray(layer.apply(params, x, (h, w)), np.float32)

        denom = np.abs(base).max()
        err = np.abs(got - base).max() / denom
        assert err < 0.06, (mode, err)  # int8 noise, not a wrong path
        assert err > 0, "quant path must actually engage"
        # 'conv' is mega-kernel-only: these kernels must ignore it
        monkeypatch.setenv("RDST_TPU_PALLAS_QUANT", "conv")
        unq = np.asarray(layer.apply(params, x, (h, w)), np.float32)
        assert np.array_equal(unq, base)

    def test_full_rdst_pair_mode(self, rng, monkeypatch):
        """Full RDSTSR forward in pair mode (interpret) agrees with the
        per-block fused mode to bf16-ulp — gates the DSTL/BasicLayer
        dispatch, dense adapters and pad/crop plumbing around it."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models.rdst import RDSTSR

        model = RDSTSR(in_chans=1, sr_scale=2, embed_dim=12,
                       dense_layer_depths=(2,), num_heads=(3,),
                       window_size=(8,), rdb_depths=(2,), mlp_ratio=2.0,
                       growth_rate=6, build_resolution=(16, 16),
                       dtype=jnp.bfloat16)
        x = jnp.asarray(rng.normal(0, 0.3, (1, 16, 16, 1)), jnp.bfloat16)
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("RDST_TPU_PALLAS", "swin")
        params = model.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(model.apply(params, x), np.float32)
        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        got = np.asarray(model.apply(params, x), np.float32)
        assert np.abs(got - ref).max() <= 2e-3 * np.abs(ref).max()

    def test_pair_matches_xla_f32_reference(self, rng, monkeypatch):
        """bf16 pair kernel vs the f32 XLA path: bf16-limited agreement,
        no systematic error from the fused relayout."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.nn.swin import BasicLayer

        b, h, w, c, nh, ws = 2, 16, 16, 12, 3, 8
        xf = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        kw = dict(dim=c, depth=2, num_heads=nh, window_size=ws,
                  mlp_ratio=2.0, build_resolution=(h, w))
        monkeypatch.setenv("RDST_TPU_PALLAS", "0")
        ref_layer = BasicLayer(**kw)
        params = ref_layer.init(jax.random.PRNGKey(0), xf, (h, w))
        ref = np.asarray(ref_layer.apply(params, xf, (h, w)))

        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        monkeypatch.setenv("RDST_TPU_PALLAS_INTERPRET", "1")
        pair_layer = BasicLayer(dtype=jnp.bfloat16, **kw)
        got = np.asarray(
            pair_layer.apply(params, xf.astype(jnp.bfloat16), (h, w)),
            np.float32)
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.05
        assert np.abs(got - ref).mean() / denom < 0.005


class TestAutoSoftmax:
    """pallas_softmax='auto' (r5): audited clamp-vs-stable dispatch.

    The stable softmax costs -7.7% inference / -21% train vs clamp
    (PERF.md r4), but clamp corrupts past logit 60 (the r4 100k run
    reached 227 and NaN'd on chip). 'auto' picks clamp only for
    checkpoints whose audited attn_logit_max clears the safety margin."""

    def test_resolve_policy(self):
        from rdst_tpu.kernels.swin_block import (AUTO_CLAMP_MARGIN,
                                                 resolve_softmax_auto)

        # escalation target is stable_bc since r5: exact like stable
        # (gated together in test_large_logit_stability) and measured
        # faster on chip (2770 vs 2719 slices/s, bench_stable_bc)
        assert resolve_softmax_auto(None) == "stable_bc"   # unstamped
        assert resolve_softmax_auto(25.0) == "clamp"    # 40k-recipe regime
        assert resolve_softmax_auto(227.0) == "stable_bc"  # r4 100k regime
        assert resolve_softmax_auto(AUTO_CLAMP_MARGIN) == "stable_bc"
        assert AUTO_CLAMP_MARGIN < 60.0  # margin strictly below the clamp

    def test_unresolved_auto_traces_stable(self, monkeypatch):
        # 'auto' reaching a trace unresolved must fail safe to stable
        from rdst_tpu.kernels.swin_block import _softmax_variant

        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "auto")
        assert _softmax_variant() == ""

    def test_export_config_key(self, monkeypatch):
        import os

        from rdst_tpu.kernels.window_attention import export_kernel_flags

        monkeypatch.delenv("RDST_TPU_PALLAS_SOFTMAX", raising=False)
        export_kernel_flags({"pallas_softmax": "auto"})
        assert os.environ["RDST_TPU_PALLAS_SOFTMAX"] == "auto"
        export_kernel_flags({})  # absent key leaves the env untouched
        assert os.environ["RDST_TPU_PALLAS_SOFTMAX"] == "auto"
        export_kernel_flags({"pallas_softmax": "none"})
        assert "RDST_TPU_PALLAS_SOFTMAX" not in os.environ
        with pytest.raises(ValueError):
            export_kernel_flags({"pallas_softmax": "bogus"})

    def test_sidecar_resolution(self, tmp_path, monkeypatch):
        import json
        import os

        from rdst_tpu.checkpoint.loading import resolve_pallas_softmax

        w = tmp_path / "m.msgpack"
        w.write_bytes(b"")
        sc = tmp_path / "m.stats.json"

        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "auto")
        sc.write_text(json.dumps({"attn_logit_max": 25.1}))
        assert resolve_pallas_softmax(str(w)) == "clamp"
        assert os.environ["RDST_TPU_PALLAS_SOFTMAX"] == "clamp"

        # regression for the r4 failure mode: a 100k-schedule bound
        # (measured max 227 on chip) must keep an exact stable softmax
        # (stable_bc since r5 — same numerics, faster)
        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "auto")
        sc.write_text(json.dumps({"attn_logit_max": 227.0}))
        assert resolve_pallas_softmax(str(w)) == "stable_bc"

        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "auto")
        sc.write_text(json.dumps({"mean": [0.0], "std": [1.0]}))  # no stamp
        assert resolve_pallas_softmax(str(w)) == "stable_bc"

        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "auto")
        assert resolve_pallas_softmax(None) == "stable_bc"  # no weights

        monkeypatch.setenv("RDST_TPU_PALLAS_SOFTMAX", "clamp")
        assert resolve_pallas_softmax(str(w)) == "clamp"  # non-auto passthru

    def test_probe_measures_bound(self, rng):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels.logit_audit import measure_logit_bound
        from rdst_tpu.nn.swin import BasicLayer

        b, h, w, c, nh, ws = 1, 8, 8, 12, 2, 4
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        layer = BasicLayer(dim=c, depth=2, num_heads=nh, window_size=ws,
                           mlp_ratio=2.0, build_resolution=(h, w))
        params = layer.init(jax.random.PRNGKey(0), x, (h, w))
        bound = measure_logit_bound(layer, params, x, (h, w))
        assert bound is not None and np.isfinite(bound)
        # scaling qkv weights scales logits quadratically: the audit
        # must see the growth (this is what catches a 100k-style run)
        big = jax.tree.map(lambda a: a * 8.0, params)
        assert measure_logit_bound(layer, big, x, (h, w)) > bound + 1.0

    def test_probe_none_without_attention(self, rng):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels.logit_audit import measure_logit_bound
        from rdst_tpu.models.edsr import EDSR

        m = EDSR(n_resblocks=1, n_feats=8, sr_scale=2)
        x = jnp.asarray(rng.random((1, 8, 8, 1)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        assert measure_logit_bound(m, params, x) is None

    def test_audit_env_restores_kernel_env(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.kernels.logit_audit import measure_logit_bound
        from rdst_tpu.nn.swin import BasicLayer

        monkeypatch.setenv("RDST_TPU_PALLAS", "pair")
        monkeypatch.delenv("RDST_TPU_LOGIT_AUDIT", raising=False)
        b, h, w, c = 1, 8, 8, 12
        x = jnp.asarray(rng.normal(0, 1, (b, h * w, c)), jnp.float32)
        layer = BasicLayer(dim=c, depth=2, num_heads=2, window_size=4,
                           mlp_ratio=2.0, build_resolution=(h, w))
        params = layer.init(jax.random.PRNGKey(0), x, (h, w))
        measure_logit_bound(layer, params, x, (h, w))
        import os
        assert os.environ["RDST_TPU_PALLAS"] == "pair"
        assert "RDST_TPU_LOGIT_AUDIT" not in os.environ
