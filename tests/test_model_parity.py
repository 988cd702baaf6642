"""Checkpoint-parity tests: random-initialized reference torch models,
weights imported through the converter, outputs compared on fixed inputs.

This is the §7.3.1 'hard part' gate: any silent layout/ordering mismatch
(qkv fusion, relative-position table, PixelShuffle channel order) shows
up here as a large output diff.
"""

import numpy as np
import pytest

from rdst_tpu.checkpoint.torch_import import convert_state_dict, verify_params_match
from rdst_tpu.config import ParametersLoader


def _paras(**overrides):
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
    # small config: quick to build in torch and jax
    p.set("rdst_dense_layer_depths", [2, 2])
    p.set("rdst_num_heads", [6, 6])
    p.set("rdst_window_size", [8, 8])
    p.set("rdst_rdb_depths", [2, 2])
    p.set("sir_swintr_layers", [2, 2])
    p.set("sir_num_heads", [6, 6])
    p.set("swin_drop_path_rate", 0.0)
    p.set("sir_drop_path_rate", 0.0)
    for k, v in overrides.items():
        p.set(k, v)
    return p


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    import torch_ref

    return torch_ref


class TestRDSTParity:
    @pytest.mark.parametrize("pre_norm", [True, False])
    def test_forward_matches_reference(self, ref, pre_norm):
        import jax

        paras = _paras(rdst_pre_norm=pre_norm)
        _, variations = ref.import_reference_networks()
        tmodel = variations.make_RDSTSR(paras, mean=[0.1], std=[0.9])

        from rdst_tpu.models.rdst import make_rdst

        jmodel = make_rdst(paras, mean=[0.1], std=[0.9])

        x = np.random.default_rng(0).random((2, 16, 16, 1)).astype(np.float32)
        want = ref.torch_forward_nhwc(tmodel, x)

        params = convert_state_dict(tmodel.state_dict(), "rdst")
        init = jmodel.init(jax.random.PRNGKey(0), x[:1])
        verify_params_match(params, init)
        got = np.asarray(jmodel.apply(params, x))

        diff = np.abs(got - want).max()
        assert diff < 2e-4, f"max abs diff {diff}"

    def test_3conv_residual_variant(self, ref):
        import jax

        paras = _paras(rdst_res_connection="3conv")
        _, variations = ref.import_reference_networks()
        tmodel = variations.make_RDSTSR(paras)
        from rdst_tpu.models.rdst import make_rdst

        jmodel = make_rdst(paras)
        x = np.random.default_rng(1).random((1, 16, 16, 1)).astype(np.float32)
        want = ref.torch_forward_nhwc(tmodel, x)
        params = convert_state_dict(tmodel.state_dict(), "rdst")
        verify_params_match(params, jmodel.init(jax.random.PRNGKey(0), x))
        got = np.asarray(jmodel.apply(params, x))
        assert np.abs(got - want).max() < 2e-4

    def test_arbitrary_input_size(self, ref):
        """Whole-slice inference sizes (mask recompute path)."""
        import jax

        paras = _paras()
        _, variations = ref.import_reference_networks()
        tmodel = variations.make_RDSTSR(paras)
        from rdst_tpu.models.rdst import make_rdst

        jmodel = make_rdst(paras)
        x = np.random.default_rng(2).random((1, 40, 32, 1)).astype(np.float32)
        want = ref.torch_forward_nhwc(tmodel, x)
        params = convert_state_dict(tmodel.state_dict(), "rdst")
        got = np.asarray(jmodel.apply(params, x))
        assert np.abs(got - want).max() < 2e-4


class TestSwinIRParity:
    @pytest.mark.parametrize("upsampler", ["pixelshuffledirect", "pixelshuffle"])
    def test_forward_matches_reference(self, ref, upsampler):
        import jax

        paras = _paras(sir_upsampler=upsampler)
        swin_sr, _ = ref.import_reference_networks()
        tmodel = swin_sr.swinir_make_model(paras)
        from rdst_tpu.models.swinir import make_swinir

        jmodel = make_swinir(paras)
        x = np.random.default_rng(3).random((1, 16, 16, 1)).astype(np.float32)
        want = ref.torch_forward_nhwc(tmodel, x)
        params = convert_state_dict(tmodel.state_dict(), "swinir", upsampler=upsampler)
        verify_params_match(params, jmodel.init(jax.random.PRNGKey(0), x))
        got = np.asarray(jmodel.apply(params, x))
        assert np.abs(got - want).max() < 2e-4


class TestTorchExport:
    def test_flax_to_torch_roundtrip_forward(self, ref):
        """Export flax RDST params to a torch state_dict, load into the
        reference model, and compare outputs (full interchange)."""
        import jax

        from rdst_tpu.checkpoint.torch_export import export_rdstsr
        from rdst_tpu.models.rdst import make_rdst

        paras = _paras()
        jmodel = make_rdst(paras, mean=[0.2], std=[0.8])
        x = np.random.default_rng(5).random((1, 16, 16, 1)).astype(np.float32)
        jparams = jmodel.init(jax.random.PRNGKey(3), x)
        want = np.asarray(jmodel.apply(jparams, x))

        import torch

        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in export_rdstsr(jparams, mean=[0.2], std=[0.8]).items()}
        _, variations = ref.import_reference_networks()
        tmodel = variations.make_RDSTSR(paras, mean=[0.2], std=[0.8])
        missing, unexpected = tmodel.load_state_dict(sd, strict=False)
        # only recomputed buffers may be missing
        assert all(("relative_position_index" in k or "attn_mask" in k)
                   for k in missing), missing
        assert not unexpected, unexpected

        got = ref.torch_forward_nhwc(tmodel, x)
        assert np.abs(got - want).max() < 2e-4

    @pytest.mark.parametrize("upsampler", ["pixelshuffledirect", "pixelshuffle"])
    def test_swinir_export_roundtrip(self, ref, upsampler):
        """flax SwinIR -> torch state_dict -> reference model -> same output."""
        import jax

        from rdst_tpu.checkpoint.torch_export import export_swinir
        from rdst_tpu.models.swinir import make_swinir

        paras = _paras(sir_upsampler=upsampler)
        jmodel = make_swinir(paras)
        x = np.random.default_rng(6).random((1, 16, 16, 1)).astype(np.float32)
        jparams = jmodel.init(jax.random.PRNGKey(4), x)
        want = np.asarray(jmodel.apply(jparams, x))

        import torch

        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in export_swinir(jparams).items()}
        swin_sr, _ = ref.import_reference_networks()
        tmodel = swin_sr.swinir_make_model(paras)
        missing, unexpected = tmodel.load_state_dict(sd, strict=False)
        assert all(("relative_position_index" in k or "attn_mask" in k
                    or k == "mean") for k in missing), missing
        assert not unexpected, unexpected

        got = ref.torch_forward_nhwc(tmodel, x)
        assert np.abs(got - want).max() < 2e-4


def test_flagship_weights_asset_loads():
    """The committed flagship checkpoint deserializes into the E1-40k
    config's model template (guards the asset against layout drift)."""
    import pathlib

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from rdst_tpu.models import build_generator

    repo = pathlib.Path(__file__).resolve().parents[1]
    asset = repo / "weights" / "rdst_e1_40k_best_oasis_x4.msgpack"
    assert asset.exists()
    p = ParametersLoader(str(repo / "config_files" / "rdst_e1_40k_oasis_x4.ini"))
    model = build_generator(p)
    template = jax.jit(model.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 16, 1)))
    params = serialization.from_bytes(jax.device_get(template),
                                      asset.read_bytes())
    n = sum(x.size for x in jax.tree.leaves(params))
    assert n > 4_000_000  # full RDST-E1 (4.46M params)
