"""Zoo-wide torch forward-parity: every remaining feature_generator is
gated numerically against the reference networks (fixed random torch
weights imported through the production converter, f32, <=1e-4).

Complements test_model_parity.py (RDST/SwinIR) and test_model_zoo.py
(EDSR/MetaUpSampler). PReLU-activated families compare at torch init
(slope 0.25), where torch PReLU == the flax fixed-slope approximation.
"""

import numpy as np
import pytest

from rdst_tpu.checkpoint.torch_import import convert_state_dict, verify_params_match
from rdst_tpu.config import ParametersLoader


def _paras(**overrides):
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    p = ParametersLoader(str(repo / "config_files" / "rdst_e1_oasis_x4.ini"))
    for k, v in overrides.items():
        p.set(k, v)
    return p


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    import sys

    import torch_ref

    torch_ref._install_timm_shim()
    if torch_ref.REFERENCE not in sys.path:
        sys.path.insert(0, torch_ref.REFERENCE)
    return torch_ref


def _check(ref, tmodel, jmodel, arch, x, extra=(), tol=1e-4, verify=True,
           **mapper_kwargs):
    import jax

    want = ref.torch_forward_nhwc(tmodel, x, *extra)
    params = convert_state_dict(tmodel.state_dict(), arch, **mapper_kwargs)
    if verify:
        init = jmodel.init(jax.random.PRNGKey(0), x[:1], *extra)
        verify_params_match(params, init)
    got = np.asarray(jmodel.apply(params, x, *extra))
    assert got.shape == want.shape, (got.shape, want.shape)
    diff = np.abs(got - want).max()
    assert diff < tol, f"{arch}: max abs diff {diff}"


class TestConvZooParity:
    def test_srresnet(self, ref):
        from networks.srresnet import SRResNet as T

        from rdst_tpu.models.srresnet import make_srresnet

        p = _paras(srresnet_n_feats=12, srresnet_n_resblocks=2,
                   srresnet_res_scale=0.9, srresnet_bn=None,
                   srresnet_act="leaky_relu")
        x = np.random.default_rng(0).random((2, 10, 12, 1)).astype(np.float32)
        _check(ref, T(p, mean=[0.1], std=[0.9]),
               make_srresnet(p, mean=[0.1], std=[0.9]), "srresnet", x)

    def test_rdn(self, ref):
        from networks.rdn import RDN as T

        from rdst_tpu.models.rdn import make_rdn

        p = _paras(rdn_growth_rate=6, rdn_n_dense_layers=3, rdn_n_blocks=2,
                   rdn_dense_scale=0.8, rdn_bn=None, rdn_n_feats=12,
                   rdn_local_res_scale=0.9, rdn_global_res_scale=1.1)
        x = np.random.default_rng(1).random((1, 12, 8, 1)).astype(np.float32)
        _check(ref, T(p), make_rdn(p), "rdn", x)

    def test_srdensenet(self, ref):
        from networks.srdensenet import SRDenseNet as T

        from rdst_tpu.models.srdensenet import make_srdensenet

        for typ in ("h", "hl", "all"):
            p = _paras(srdensenet_growth_rate=6, srdensenet_n_dense_layers=3,
                       srdensenet_n_dense_blocks=2, srdensenet_type=typ,
                       srdensenet_dense_scale=1.0, srdensenet_n_feats=16,
                       srdensenet_bn=None, srdensenet_act="relu")
            x = np.random.default_rng(2).random((1, 8, 8, 1)).astype(np.float32)
            _check(ref, T(p), make_srdensenet(p), "srdensenet", x)

    def test_esrgan(self, ref):
        from networks.esrgan import ESRGAN as T

        from rdst_tpu.models.esrgan import make_esrgan

        p = _paras(esrgan_growth_rate=6, esrgan_n_dense_layers=2,
                   esrgan_n_rdb=2, esrgan_n_blocks=2, esrgan_dense_scale=1.0,
                   esrgan_rdb_res_scale=0.2, esrgan_rrdb_res_scale=0.2,
                   esrgan_global_res_scale=0.9, esrgan_n_feats=12,
                   esrgan_bn=None, esrgan_act="leaky_relu",
                   esrgan_leaky_relu_slope=0.2)
        x = np.random.default_rng(3).random((1, 8, 8, 1)).astype(np.float32)
        _check(ref, T(p), make_esrgan(p), "esrgan", x)

    def test_zssr(self, ref):
        from networks.zssr import ZSSRNet_ori as T

        from rdst_tpu.models.zssr import ZSSRNet

        t = T(input_channel=1, inside_channel=8, num_layers=4, norm=None,
              activation="relu")
        j = ZSSRNet(in_chans=1, inside_channel=8, num_layers=4, act="relu")
        x = np.random.default_rng(4).random((2, 9, 7, 1)).astype(np.float32)
        _check(ref, t, j, "zssr", x, num_layers=4)

    def test_mdsr(self, ref):
        from networks.mdsr import MDSR as T

        from rdst_tpu.models.mdsr import make_mdsr

        p = _paras(mdsr_n_feats=12, mdsr_res_scale=0.9, mdsr_n_resblocks=2,
                   mdsr_bn=None, mdsr_act="leaky_relu")
        t = T(p, mean=[0.1], std=[0.9])
        j = make_mdsr(p, mean=[0.1], std=[0.9])
        x = np.random.default_rng(5).random((1, 12, 12, 1)).astype(np.float32)
        # per-scale heads/tails init lazily, so the converted tree
        # (all scales) is a superset of any single-scale init
        for s in (2.0, 3.0, 4.0):
            _check(ref, t, j, "mdsr", x, extra=(s,), verify=False)

    def test_rcan(self, ref):
        from networks.common import default_conv
        from networks.rcan import RCAN as T

        from rdst_tpu.models.rcan import RCAN

        t = T(default_conv, 1, 2, 2, 16, 4, 4, 1.0, mean=[0.1], std=[0.9])
        j = RCAN(in_chans=1, sr_scale=4, n_resgroups=2, n_resblocks=2,
                 n_feats=16, reduction=4, mean=(0.1,), std=(0.9,))
        x = np.random.default_rng(6).random((1, 8, 8, 1)).astype(np.float32)
        _check(ref, t, j, "rcan", x)

    def test_han(self, ref):
        from networks.common import default_conv
        from networks.han import HAN as T

        from rdst_tpu.models.han import HAN

        # the reference hard-codes last_conv to n_feats*11 channels, so
        # the group count must stay 10 (han.py:194); shrink everything else
        t = T(default_conv, 1, 10, 1, 8, 4, 4, 1.0, mean=[0.1], std=[0.9])
        j = HAN(in_chans=1, sr_scale=4, n_resgroups=10, n_resblocks=1,
                n_feats=8, reduction=4, mean=(0.1,), std=(0.9,))
        x = np.random.default_rng(7).random((1, 8, 8, 1)).astype(np.float32)
        _check(ref, t, j, "han", x)

    def test_convnext(self, ref):
        from networks.convnet import ConvNetSR as T

        from rdst_tpu.models.convnext_sr import ConvNetSR

        t = T(1, 4, 16, 2, 0.9)
        j = ConvNetSR(in_chans=1, sr_scale=4, n_feats=16, n_blocks=2,
                      res_scale=0.9)
        x = np.random.default_rng(8).random((1, 10, 8, 1)).astype(np.float32)
        _check(ref, t, j, "convnext", x)

    def test_dbpn(self, ref):
        from networks.dbpn import DeepBackProjectionNet as T

        from rdst_tpu.models.dbpn import DBPN

        for dense in (False, True):
            t = T(1, 16, 8, t=3, sr_factor=4, dense=dense)
            j = DBPN(in_chans=1, n0=16, nr=8, t=3, sr_scale=4, dense=dense)
            x = np.random.default_rng(9).random((1, 8, 8, 1)).astype(np.float32)
            _check(ref, t, j, "dbpn", x)

    def test_edsr_via_converter(self, ref):
        from networks.edsr import EDSR as T

        from rdst_tpu.models.edsr import make_edsr

        p = _paras(edsr_n_resblocks=2, edsr_n_feats=12, edsr_res_scale=0.9,
                   edsr_bn=None, edsr_act="leaky_relu")
        x = np.random.default_rng(10).random((1, 10, 12, 1)).astype(np.float32)
        _check(ref, T(p, mean=[0.1], std=[0.9]),
               make_edsr(p, mean=[0.1], std=[0.9]), "edsr", x)


class TestIPTParity:
    def test_ipt(self, ref):
        from networks.ipt import IPT as T

        from rdst_tpu.models.ipt import make_ipt

        p = _paras(patch_size=12, all_sr_scales=[2.0, 4.0], ipt_n_feats=4,
                   ipt_patch_dim=3, ipt_num_heads=2, ipt_num_layers=2,
                   ipt_num_queries=2, ipt_dropout_rate=0, ipt_no_norm=False,
                   ipt_no_mlp=False, ipt_pos_every=False, ipt_no_pos=False,
                   ipt_act="relu")
        t = T(p, mean=[0.1], std=[0.9])
        j = make_ipt(p, mean=[0.1], std=[0.9])
        x = np.random.default_rng(11).random((1, 12, 12, 1)).astype(np.float32)
        for s in (2.0, 4.0):
            _check(ref, t, j, "ipt", x, extra=(s,), tol=5e-4, verify=False)


class TestTemplateExport:
    """Generic index-traced flax->torch export (torch_export.
    export_from_template): import a reference state_dict, export it back
    through the template, and require exact recovery of every key the
    import consumed."""

    def _roundtrip(self, tmodel, arch, mean=(0.0,), std=(1.0,), **kw):
        import torch

        from rdst_tpu.checkpoint.torch_export import export_from_template
        from rdst_tpu.checkpoint.torch_import import state_dict_to_numpy

        sd = state_dict_to_numpy(tmodel.state_dict())
        params = convert_state_dict(sd, arch, **kw)
        back = export_from_template(params, arch, tmodel.state_dict(),
                                    mean=mean, std=std, **kw)
        missing = []
        for k, v in sd.items():
            if k not in back:
                missing.append(k)
                continue
            np.testing.assert_allclose(
                back[k], v, rtol=0, atol=1e-6,
                err_msg=f"{arch} template-export mismatch at {k}")
        # only import-skipped buffer keys may be absent
        for k in missing:
            assert any(t in k for t in
                       ("activation", "relative_position_index",
                        "attn_mask")), f"{arch}: lost key {k}"

    def test_edsr(self, ref):
        from networks.edsr import EDSR as T

        p = _paras(edsr_n_resblocks=2, edsr_n_feats=12, edsr_res_scale=0.9,
                   edsr_bn=None, edsr_act="leaky_relu")
        self._roundtrip(T(p, mean=[0.1], std=[0.9]), "edsr",
                        mean=[0.1], std=[0.9])

    def test_rdn(self, ref):
        from networks.rdn import RDN as T

        p = _paras(rdn_growth_rate=6, rdn_n_dense_layers=3, rdn_n_blocks=2,
                   rdn_dense_scale=0.8, rdn_bn=None, rdn_n_feats=12,
                   rdn_local_res_scale=0.9, rdn_global_res_scale=1.1)
        self._roundtrip(T(p), "rdn")

    def test_rcan(self, ref):
        from networks.common import default_conv
        from networks.rcan import RCAN as T

        t = T(default_conv, 1, 2, 2, 16, 4, 4, 1.0, mean=[0.1], std=[0.9])
        self._roundtrip(t, "rcan", mean=[0.1], std=[0.9])
