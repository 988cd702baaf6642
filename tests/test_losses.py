"""Loss subsystem tests: multi-stage registry, seg-UNet modes, VGG,
adversarial family (all gan_types), and GAN training integration."""

import numpy as np
import pytest

from rdst_tpu.config import ParametersLoader


def _paras(**overrides):
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
    p.set("patch_size", 8)
    for k, v in overrides.items():
        p.set(k, v)
    return p


class TestSRLossRegistry:
    def test_multi_stage_scalars(self):
        import jax.numpy as jnp

        from rdst_tpu.losses.sr_loss import SRLoss

        p = _paras(training_losses=["L1", "MSE"],
                   loss_scalars={"A": {"L1": 1.0}, "B": {"L1": 0.1, "MSE": 2.0}},
                   training_states=["A", "B"])
        loss = SRLoss(p)
        pred = jnp.ones((2, 4, 4, 1))
        batch = {"out": jnp.zeros((2, 4, 4, 1))}
        total_a, _ = loss(pred, batch, "A")
        total_b, rep_b = loss(pred, batch, "B")
        assert float(total_a) == pytest.approx(1.0)
        assert float(total_b) == pytest.approx(0.1 * 1 + 2.0 * 1)
        assert set(rep_b) == {"L1", "MSE"}

    def test_records_table(self):
        from rdst_tpu.losses.sr_loss import SRLoss

        p = _paras(training_losses=["L1"],
                   loss_scalars={"A": {"L1": 1.0}}, training_states=["A"])
        loss = SRLoss(p)
        loss.record({"L1": 0.5}, "A")
        loss.record({"L1": 0.3}, "A")
        table = loss.print_records()
        assert "0.4" in table  # mean


class TestSegUNetLoss:
    @pytest.mark.parametrize("mode,layers", [
        ("encoder-L1", [1]),
        ("decoder", None),
        ("label-hr", None),
        ("label-gt", None),
    ])
    def test_modes_produce_grads(self, mode, layers, rng):
        import warnings

        import jax
        import jax.numpy as jnp

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from rdst_tpu.losses.seg_unet import SegUNetLoss

            p = _paras(unet_loss_layers={mode: layers},
                       unet_loss_mode="OASIS_lesion_only")
            term = SegUNetLoss(p)

        pred = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
        target = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
        batch = {"seg_gt": jnp.zeros((2, 32, 32, 1))}

        def f(x):
            return term(x, target, batch)

        val, grad = jax.value_and_grad(f)(pred)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0

    def test_dice_loss_perfect_prediction(self):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.losses.seg_unet import dice_loss

        labels = jnp.asarray(np.random.default_rng(0).integers(0, 4, (2, 8, 8)))
        logits = 100.0 * jax.nn.one_hot(labels, 4)
        assert float(dice_loss(logits, labels, [0, 1, 2, 3])) < 1e-3


class TestVGGLoss:
    def test_grayscale_replication_and_grads(self, rng):
        import warnings

        import jax
        import jax.numpy as jnp

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from rdst_tpu.losses.vgg import VGGLoss

            term = VGGLoss("VGG22")
        pred = jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32)
        target = jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32)
        val, grad = jax.value_and_grad(lambda x: term(x, target))(pred)
        assert np.isfinite(float(val)) and float(val) > 0
        assert np.abs(np.asarray(grad)).max() > 0

    def test_multichannel_loop(self, rng):
        import warnings

        import jax.numpy as jnp

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from rdst_tpu.losses.vgg import VGGLoss

            term = VGGLoss("VGG22")
        pred = jnp.asarray(rng.random((1, 32, 32, 4)), jnp.float32)
        assert np.isfinite(float(term(pred, pred)))


class TestAdversarial:
    @pytest.mark.parametrize("gan_type", ["GAN", "RaGAN", "WGAN", "WGAN_GP", "ScaleGAN"])
    def test_d_step_and_g_loss(self, gan_type, rng):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.losses.adversarial import ScaleAdversarial

        p = _paras(gan_type=gan_type, gan_k=2, patch_size=8, sr_scale=4.0,
                   gan_d_base_features=8, gan_d_depth=3)
        adv = ScaleAdversarial(p)
        hr = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
        fake = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
        state = adv.init(jax.random.PRNGKey(0), hr)
        scales = jnp.full((2, 1), 4.0)

        new_state, report = jax.jit(adv.d_step)(state, fake, hr, scales,
                                                jax.random.PRNGKey(1))
        assert np.isfinite(float(report["Adv_D"]))
        # D params actually moved
        delta = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                             state["params"], new_state["params"])
        assert max(jax.tree.leaves(delta)) > 0

        g = adv.g_loss(new_state, fake, hr, scales)
        assert np.isfinite(float(g))
        if gan_type == "WGAN":
            clip = p.wgan_clip_value
            assert all(np.abs(np.asarray(l)).max() <= clip + 1e-6
                       for l in jax.tree.leaves(new_state["params"]))

    def test_gan_training_integration(self, tmp_path, rng):
        """Full trainer loop with a GAN stage on the CPU mesh."""
        import pathlib

        from rdst_tpu.data import synthetic
        from rdst_tpu.data.readers import make_train_valid_datasets
        from rdst_tpu.runners.trainer import SRTrainer

        data = tmp_path / "OASIS" / "example"
        synthetic.make_oasis_example(str(data), shape=(40, 48, 40))
        repo = pathlib.Path(__file__).resolve().parents[1]
        p = ParametersLoader(str(repo / "config_files" / "rdst_tiny_oasis_x4.ini"))
        p.set("data_folder", str(data))
        p.set("output_dir", str(tmp_path / "outputs"))
        p.set("model_name", "GAN_TINY")
        p.set("patch_size", 8)
        p.set("margin_oasis", [2, 2])
        p.set("batch_size", 8)
        p.set("rdst_embed_dim", 12)
        p.set("rdst_num_heads", [2])
        p.set("rdst_window_size", [4])
        p.set("rdst_dense_layer_depths", [2])
        p.set("rdst_rdb_depths", [1])
        p.set("rdst_growth_rate", 12)
        p.set("multi_threads", 1)
        # ScaleGAN also covers the fixed-scale regression: its D labels
        # are 1/scale, so the trainer must feed per-batch sr_scales even
        # when scale_free is off
        p.set("gan_type", "ScaleGAN")
        p.set("gan_k", 1)
        p.set("gan_d_base_features", 8)
        p.set("gan_d_depth", 3)
        p.set("training_losses", ["L1", "GAN"])
        p.set("training_states", ["GAN-FT"])
        p.set("epochs_in_total", {"GAN-FT": 2})
        p.set("loss_scalars", {"GAN-FT": {"L1": 1.0, "GAN": 0.1}})
        p.set("check_every", 2)
        p.set("quick_eva_num_samples", 2)

        ds_train, ds_valid = make_train_valid_datasets(p)
        trainer = SRTrainer(p, ds_train, ds_valid, seed=0)
        trainer.setup()
        assert trainer.d_state is not None
        trainer.train()
        recs = trainer.loss.records["GAN-FT"]
        assert "GAN" in recs and "Adv_D" in recs
        assert all(np.isfinite(v) for v in recs["Adv_D"])


class TestNativeVGGAssets:
    """The committed VGG substitute makes VGG/FID paths learned, not random."""

    def test_vgg_loss_uses_native_weights(self):
        import pathlib
        import warnings

        import jax.numpy as jnp

        from rdst_tpu.losses.vgg import VGGLoss

        assert (pathlib.Path(__file__).parents[1]
                / "weights" / "vgg19_features_native.pkl").exists()
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # random-init fallback must not fire
            loss = VGGLoss("VGG22")
        a = jnp.zeros((1, 32, 32, 1))
        b = jnp.ones((1, 32, 32, 1)) * 0.3
        assert float(loss(a, b)) > 0
        assert float(loss(a, a)) == 0.0

    def test_fid_uses_native_features(self):
        import numpy as np

        from rdst_tpu.metrics.fid import FID

        f = FID()
        assert type(f.extractor).__name__ == "_NativeVGGFeatures"
        rng = np.random.default_rng(0)
        a = [rng.random((32, 32, 1)).astype(np.float32) for _ in range(8)]
        b = [x + 0.2 * rng.standard_normal(x.shape).astype(np.float32)
             for x in a]
        assert f(a, b) > f(a, [x.copy() for x in a]) + 1e-3
