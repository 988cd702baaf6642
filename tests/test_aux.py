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
