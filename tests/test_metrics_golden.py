"""Value-level gates for the sewar metric set (VERDICT round-1 #4).

Two layers (sewar itself is not installable here, and the reference's
metric path cannot run without it — see tests/sewar_ref.py):

1. cross-implementation: production (uniform_filter mean/variance
   identities) vs tests/sewar_ref.py (explicit padded window-sum
   convolutions, direct covariance algebra) must agree to 1e-12 —
   catches formula/normalization/windowing errors;
2. frozen goldens on deterministic fixtures — catches regressions and
   silent convention drift (window sizes, crops, channel averaging).
"""

import json
import pathlib

import numpy as np
import pytest

from rdst_tpu.metrics import image_metrics as im

GOLDENS = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "metric_goldens.json")
    .read_text())

CROSS_CHECKED = ["mse", "rmse", "rmse_sw", "uqi", "ergas", "scc", "rase",
                 "sam", "psnrb"]


def fixtures():
    """(gt, pred, blocky, rgb_gt, rgb_pred) — deterministic."""
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:64, 0:48]
    gt = 0.5 + 0.3 * np.sin(yy / 7.0) * np.cos(xx / 5.0)
    gt = (gt + 0.1 * rng.random((64, 48))).astype(np.float64)
    pred = np.clip(gt + 0.05 * rng.standard_normal((64, 48)), 0, 1)
    blocky = gt.copy()
    blocky[:, ::8] += 0.1  # 8-aligned vertical seams for psnrb's penalty
    rgb_gt = np.stack([gt, gt * 0.9 + 0.05, gt * 1.1 - 0.02], -1)
    rgb_p = np.clip(rgb_gt + 0.04 * rng.standard_normal(rgb_gt.shape), 0, 1.2)
    return gt, pred, blocky, rgb_gt, rgb_p


class TestCrossImplementation:
    @pytest.mark.parametrize("name", CROSS_CHECKED)
    def test_matches_independent_formula(self, name):
        import sewar_ref

        gt, pred, blocky, rgb_gt, rgb_p = fixtures()
        f_prod, f_ref = getattr(im, name), getattr(sewar_ref, name)
        for a, b in [(gt, pred), (gt, blocky), (rgb_gt, rgb_p)]:
            want, got = f_ref(a, b), f_prod(a, b)
            assert abs(got - want) < 1e-12 * max(1.0, abs(want)), (
                f"{name}: {got} vs independent {want}")


class TestGoldenValues:
    @pytest.mark.parametrize("name", sorted(GOLDENS))
    def test_frozen_value(self, name):
        gt, pred, blocky, rgb_gt, rgb_p = fixtures()
        f = getattr(im, name)
        got = [f(gt, pred), f(gt, blocky), f(rgb_gt, rgb_p)]
        np.testing.assert_allclose(got, GOLDENS[name], rtol=1e-9,
                                   err_msg=name)

    def test_psnrb_penalizes_blocking(self):
        gt, pred, blocky, *_ = fixtures()
        # blocking seams: psnrb < psnr; smooth noise: psnrb == psnr
        assert im.psnrb(gt, blocky) < im.psnr(gt, blocky) - 1.0
        assert abs(im.psnrb(gt, pred) - im.psnr(gt, pred)) < 1e-12
