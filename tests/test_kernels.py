"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest


class TestFusedWindowAttention:
    @pytest.mark.parametrize("nh,hd,nw", [(6, 10, 1), (6, 15, 4), (2, 32, 2)])
    def test_matches_reference_math(self, rng, nh, hd, nw):
        from rdst_tpu.kernels.window_attention import (
            fused_window_attention,
            reference_window_attention,
        )

        n = 64
        b_ = nw * 3
        q = rng.normal(0, 1, (b_, nh, n, hd)).astype(np.float32)
        k = rng.normal(0, 1, (b_, nh, n, hd)).astype(np.float32)
        v = rng.normal(0, 1, (b_, nh, n, hd)).astype(np.float32)
        bias = rng.normal(0, 1, (nw, nh, n, n)).astype(np.float32)

        want = np.asarray(reference_window_attention(q, k, v, bias))
        got = np.asarray(fused_window_attention(q, k, v, bias, interpret=True))
        assert np.abs(got - want).max() < 1e-5

    def test_shift_mask_semantics(self, rng):
        """With a -100 mask block, masked positions get ~zero attention."""
        from rdst_tpu.kernels.window_attention import fused_window_attention

        nh, n, hd, nw = 2, 64, 16, 2
        q = rng.normal(0, 1, (nw, nh, n, hd)).astype(np.float32)
        k = rng.normal(0, 1, (nw, nh, n, hd)).astype(np.float32)
        v = np.ones((nw, nh, n, hd), np.float32)
        bias = np.zeros((nw, nh, n, n), np.float32)
        bias[1, :, :, 32:] = -100.0  # second window: mask half the keys
        v[:, :, 32:, :] = 100.0

        out = np.asarray(fused_window_attention(q, k, v, bias, interpret=True))
        # window 0 attends everywhere (values >> 1); window 1 only to v=1
        assert out[1].max() < 1.5
        assert out[0].max() > 10


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

    def test_erf_polynomial(self):
        import math

        from rdst_tpu.kernels.swin_block import _erf

        xs = np.linspace(-4, 4, 201).astype(np.float32)
        want = np.array([math.erf(v) for v in xs])
        got = np.asarray(_erf(xs))
        assert np.abs(got - want).max() < 1e-6

    def test_vmem_fit_gate(self):
        from rdst_tpu.kernels.swin_block import fused_block_fits

        # RDST-E1 bench shape fits; a 256x256 SwinIR whole-slice does not
        assert fused_block_fits(20, 64, 120, 6, 240, 2)
        assert not fused_block_fits(1024, 64, 180, 6, 360, 2)
