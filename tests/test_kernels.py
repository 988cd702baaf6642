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
