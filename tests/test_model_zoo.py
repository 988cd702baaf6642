"""Model zoo: smoke tests for every registered generator + parity tests
for the families whose weight layouts the converter must get right."""

import numpy as np
import pytest

from rdst_tpu.config import ParametersLoader


def _paras(**overrides):
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
    p.set("edsr_n_resblocks", 2)
    p.set("rdn_n_blocks", 2)
    p.set("srdensenet_n_dense_blocks", 2)
    p.set("srdensenet_n_dense_layers", 2)
    p.set("srdensenet_n_feats", 32)
    p.set("esrgan_n_blocks", 2)
    p.set("zssr_num_layers", 4)
    for k, v in overrides.items():
        p.set(k, v)
    return p


ALL_GENERATORS = [
    "edsr", "rdn", "convnet-lite", "srresnet", "SRDenseNet", "esrgan", "zssr",
]


class TestZooSmoke:
    @pytest.mark.parametrize("name", ALL_GENERATORS)
    def test_forward_shapes(self, name):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models import build_generator

        p = _paras(feature_generator=name)
        m = build_generator(p)
        x = jnp.zeros((2, 12, 12, 1))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        expect = (2, 12, 12, 1) if name == "zssr" else (2, 48, 48, 1)
        assert y.shape == expect

    def test_mdsr_multi_scale(self):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models.mdsr import make_mdsr

        p = _paras(mdsr_n_resblocks=2)
        m = make_mdsr(p)
        x = jnp.zeros((1, 12, 12, 1))
        params = m.init(jax.random.PRNGKey(0), x, 2.0)
        for s in (2.0, 3.0, 4.0):
            # per-scale heads/tails initialize lazily; init once per scale
            ps = m.init(jax.random.PRNGKey(0), x, s)
            assert m.apply(ps, x, s).shape == (1, int(12 * s), int(12 * s), 1)

    @pytest.mark.parametrize("scale", [2.0, 1.5, 3.0, 4.0])
    def test_metasr_arbitrary_scales(self, scale):
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models.metasr import make_metasr

        p = _paras(meta_feature_generator="EDSR", scale_free=True)
        m = make_metasr(p)
        x = jnp.zeros((1, 8, 8, 1))
        params = m.init(jax.random.PRNGKey(0), x, scale)
        y = m.apply(params, x, scale)
        assert y.shape == (1, int(8 * scale), int(8 * scale), 1)


class TestMetaUpscaleParity:
    """MetaUpSampler vs the reference implementation (index-heavy code)."""

    @pytest.mark.parametrize("scale", [2.0, 1.5, 3.5])
    def test_matches_reference(self, reference_available, scale):
        if not reference_available:
            pytest.skip("reference not mounted")
        torch = pytest.importorskip("torch")
        import torch_ref

        torch_ref._install_timm_shim()
        import sys

        sys.path.insert(0, torch_ref.REFERENCE)
        from networks.meta_upscale import MetaUpSampler as TorchMeta

        import jax
        from rdst_tpu.models.meta_upscale import MetaUpSampler

        torch.manual_seed(0)
        c, out_c = 8, 1
        tm = TorchMeta(c, out_c, 3)
        tm.eval()

        x = np.random.default_rng(0).random((2, 6, 7, c)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale)
        want = want.numpy().transpose(0, 2, 3, 1)

        jm = MetaUpSampler(out_c=out_c)
        # map torch P2W weights -> flax
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = {"params": {"P2W": {
            "fc1": {"kernel": sd["P2W.meta_block.0.weight"].T,
                    "bias": sd["P2W.meta_block.0.bias"]},
            "fc2": {"kernel": sd["P2W.meta_block.2.weight"].T,
                    "bias": sd["P2W.meta_block.2.bias"]},
        }}}
        got = np.asarray(jm.apply(params, x, scale))
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-4


class TestCNNParity:
    """EDSR/RDN forwards vs reference via a generic sequential-key mapper
    is covered implicitly by construction; here we gate numerics of the
    shared blocks (ResBlock / ResidualDenseBlock / UpSampler) through the
    reference EDSR with hand-mapped weights."""

    def test_edsr_matches_reference(self, reference_available):
        if not reference_available:
            pytest.skip("reference not mounted")
        torch = pytest.importorskip("torch")
        import torch_ref

        torch_ref._install_timm_shim()
        import sys

        sys.path.insert(0, torch_ref.REFERENCE)
        from networks.edsr import EDSR as TorchEDSR

        import jax
        from flax.traverse_util import unflatten_dict
        from rdst_tpu.models.edsr import make_edsr

        p = _paras(edsr_n_resblocks=2)
        torch.manual_seed(0)
        tm = TorchEDSR(p, mean=[0.1], std=[0.9])
        tm.eval()
        jm = make_edsr(p, mean=[0.1], std=[0.9])

        def conv_w(v):
            return v.detach().numpy().transpose(2, 3, 1, 0)

        sd = tm.state_dict()
        flat = {
            ("head", "conv", "kernel"): conv_w(sd["head.0.weight"]),
            ("head", "conv", "bias"): sd["head.0.bias"].numpy(),
            ("body_conv", "conv", "kernel"): conv_w(sd["body.2.weight"]),
            ("body_conv", "conv", "bias"): sd["body.2.bias"].numpy(),
            ("tail_up", "conv_0", "conv", "kernel"): conv_w(sd["tail.0.0.weight"]),
            ("tail_up", "conv_0", "conv", "bias"): sd["tail.0.0.bias"].numpy(),
            ("tail_up", "conv_1", "conv", "kernel"): conv_w(sd["tail.0.2.weight"]),
            ("tail_up", "conv_1", "conv", "bias"): sd["tail.0.2.bias"].numpy(),
            ("tail_conv", "conv", "kernel"): conv_w(sd["tail.1.weight"]),
            ("tail_conv", "conv", "bias"): sd["tail.1.bias"].numpy(),
        }
        for i in range(2):
            for j, tj in ((0, 0), (1, 2)):
                flat[(f"body_{i}", f"conv_{j}", "conv", "kernel")] = conv_w(
                    sd[f"body.{i}.body.{tj}.weight"])
                flat[(f"body_{i}", f"conv_{j}", "conv", "bias")] = sd[
                    f"body.{i}.body.{tj}.bias"].numpy()
        params = {"params": unflatten_dict(flat)}

        x = np.random.default_rng(1).random((1, 10, 12, 1)).astype(np.float32)
        want = torch_ref.torch_forward_nhwc(tm, x)
        got = np.asarray(jm.apply(params, x))
        assert np.abs(got - want).max() < 1e-5


class TestESTSR:
    def test_forward_shape_and_rrdstb_depth(self):
        """ESTSR (swinIR_variations.py:349-596, dead in the reference):
        num_rrdb_blocks x RRDSTB trunk + PixelShuffle tail."""
        import jax
        import jax.numpy as jnp

        from rdst_tpu.models import build_generator

        p = _paras(feature_generator="estsr")
        p.set("rdst_embed_dim", 12)
        p.set("rdst_num_heads", [2, 2])
        p.set("rdst_window_size", [4, 4])
        p.set("rdst_dense_layer_depths", [1, 1])
        p.set("rdst_rdb_depths", [1, 1])
        p.set("rdst_growth_rate", 12)
        p.set("estsr_num_rrdb_blocks", 2)
        p.set("estsr_rrdb_depths", [2, 2])
        m = build_generator(p)
        x = jnp.zeros((1, 8, 12, 1))
        params = m.init(jax.random.PRNGKey(0), x)
        # 2 RRDSTB, each with 2 RDSTBs
        assert "body_1" in params["params"]
        assert "body_1" in params["params"]["body_0"]
        y = m.apply(params, x)
        assert y.shape == (1, 32, 48, 1)


def test_rdst_remat_grad_parity():
    """rdst_remat=True (jax.checkpoint over each RDSTB) must change
    grads by nothing beyond float noise while the traced step stays
    valid. The memory effect is a TPU-HBM property (the XLA CPU
    scheduler is not memory-targeted: temp_size is ~unchanged here at
    every geometry) — the hardware queue records memory_analysis on
    the TPU compile instead."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdst_tpu.config import ParametersLoader
    from rdst_tpu.models import build_generator

    p = ParametersLoader("config_files/rdst_tiny_oasis_x4.ini")
    p.set("swin_drop_rate", 0.0)  # identical forwards w/o rng plumbing

    def grads(remat):
        p.set("rdst_remat", remat)
        model = build_generator(p)
        x = jnp.asarray(
            np.random.default_rng(0).random((2, 8, 8, 1)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        def loss(v, xx):
            out = model.apply(v, xx, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(1),
                                    "droppath": jax.random.PRNGKey(2)})
            return jnp.mean(jnp.abs(out))

        return jax.jit(jax.grad(loss))(params, x)

    g0 = grads(False)
    g1 = grads(True)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
