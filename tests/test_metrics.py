"""Metric correctness tests: analytic values, ideal-case identities, and
reference-format report structure."""

import numpy as np
import pytest

from rdst_tpu.metrics import image_metrics as im
from rdst_tpu.metrics.evaluation import MetaSREvaluation, SRMetrics


@pytest.fixture
def imgs(rng):
    gt = rng.random((64, 64, 1)).astype(np.float64)
    noisy = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
    return gt, noisy


class TestIdentities:
    """Identical images must produce the ideal score for every metric."""

    def test_ideal_values(self, imgs):
        gt, _ = imgs
        assert im.mse(gt, gt) == 0
        assert im.rmse(gt, gt) == 0
        assert im.psnr(gt, gt) == float("inf")
        assert im.ssim(gt, gt) == pytest.approx(1.0)
        assert im.rmse_sw(gt, gt) == 0
        assert im.uqi(gt, gt) == pytest.approx(1.0, abs=1e-6)
        assert im.ergas(gt, gt) == 0
        assert im.rase(gt, gt) == 0
        assert im.scc(gt, gt) == pytest.approx(1.0, abs=1e-6)
        assert im.sam(gt, gt) == pytest.approx(0.0, abs=1e-6)
        # psnrb penalizes blockiness of the prediction even at mse=0,
        # so identical natural images score finite (sewar semantics)
        assert im.psnrb(gt, gt) > 20
        flat = np.zeros_like(gt)
        assert im.psnrb(flat, flat) == float("inf")  # no blockiness, no error

    def test_psnr_analytic(self):
        gt = np.zeros((16, 16, 1))
        p = np.full((16, 16, 1), 0.1)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
        assert im.psnr(gt, p) == pytest.approx(20.0)

    def test_mse_analytic(self):
        gt = np.zeros((4, 4))
        p = np.ones((4, 4)) * 2
        assert im.mse(gt, p) == 4.0

    def test_noise_degrades_all(self, imgs):
        gt, noisy = imgs
        assert im.psnr(gt, noisy) < 40
        assert im.ssim(gt, noisy) < 1
        assert im.vifp(gt, noisy) < 1

    def test_sam_multichannel(self, rng):
        gt = rng.random((16, 16, 3))
        noisy = np.clip(gt + rng.normal(0, 0.2, gt.shape), 1e-3, 1)
        assert im.sam(gt, noisy) > 0  # single-channel SAM is trivially 0

    def test_ssim_known_behavior(self, rng):
        # constant shift: luminance term only; SSIM must be < 1 but high
        gt = rng.random((32, 32))
        shifted = gt + 0.05
        v = im.ssim(gt, shifted)
        assert 0.8 < v < 1.0

    def test_dice(self):
        gt = np.array([[0, 1], [2, 2]])
        pred = np.array([[0, 1], [2, 0]])
        d = im.dice_coefficient(gt, pred, 3)
        assert d[0] == pytest.approx(2 * 1 / 3)
        assert d[1] == 1.0
        assert d[2] == pytest.approx(2 * 1 / 3)


class TestSRMetricsRegistry:
    def test_full_and_mean_modes(self, rng):
        gts = rng.random((3, 32, 32, 1))
        preds = np.clip(gts + rng.normal(0, 0.1, gts.shape), 0, 1)
        full = SRMetrics("psnr ssim", return_mode="full")(gts, preds)
        assert len(full["psnr"]) == 3
        mean = SRMetrics("psnr ssim", return_mode="mean")(gts, preds)
        assert np.isclose(mean["psnr"], np.mean(full["psnr"]))

    def test_margin_crop(self, rng):
        gts = rng.random((1, 32, 32, 1))
        preds = gts.copy()
        preds[0, :4, :, 0] += 10  # corrupt only the margin band
        r = SRMetrics("mse", return_mode="mean")(gts, preds, margin=4)
        assert r["mse"] == 0.0

    def test_unknown_metric_raises(self):
        with pytest.raises(ValueError):
            SRMetrics("psnr bogus")

    def test_fid_fallback_runs(self, rng):
        gts = [rng.random((32, 32, 1)) for _ in range(8)]
        r = SRMetrics("fid", return_mode="mean")(gts, gts)
        assert r["fid"] == pytest.approx(0.0, abs=1e-4)

    def test_fid_nan_predictions_degrade_to_nan(self, rng):
        # a diverged run's nan predictions once killed the whole final
        # evaluation inside scipy's sqrtm; the metric must degrade, not raise
        gts = [rng.random((32, 32, 1)) for _ in range(4)]
        preds = [np.full((32, 32, 1), np.nan) for _ in range(4)]
        with pytest.warns(UserWarning):
            r = SRMetrics("psnr fid", return_mode="mean")(gts, preds)
        assert np.isnan(r["fid"])

    def test_metric_crash_isolated_to_nan(self, rng):
        gts = [rng.random((32, 32, 1)) for _ in range(4)]
        sm = SRMetrics("psnr fid", return_mode="mean")
        for f in sm.fid_functions:
            sm.fid_functions[f] = lambda *a: (_ for _ in ()).throw(
                RuntimeError("boom"))
        preds = [np.clip(g + rng.normal(0, 0.05, g.shape), 0, 1) for g in gts]
        with pytest.warns(UserWarning, match="boom"):
            r = sm(gts, preds)
        assert np.isnan(r["fid"]) and np.isfinite(r["psnr"])


class TestMetaSREvaluation:
    def test_report_keys_and_print(self, rng):
        ev = MetaSREvaluation("psnr ssim", [2.0, 4.0], record_mode="full")
        samples, recs = [], []
        for _ in range(2):
            s, r = {}, {}
            for scale in (2.0, 4.0):
                gt = rng.random((32, 32, 1))
                s[scale] = {"gt": gt}
                r[scale] = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
            samples.append(s)
            recs.append(r)
        report = ev(recs, samples)
        assert set(report) == {"psnr_2.0", "ssim_2.0", "psnr_4.0", "ssim_4.0"}
        assert len(report["psnr_2.0"]) == 2
        txt = ev.print(report)
        assert "psnr" in txt and "ssim" in txt  # tabulate renders 2.0 as "2"

    def test_stack_reports(self):
        ev = MetaSREvaluation("psnr", [4.0], record_mode="full")
        stacked = ev.stack_eva_reports([{"psnr_4.0": [1.0, 2.0]}, {"psnr_4.0": [3.0]}])
        assert stacked["psnr_4.0"] == [1.0, 2.0, 3.0]

    def test_single_sample_dict_form(self, rng):
        ev = MetaSREvaluation("psnr", [4.0], record_mode="mean")
        gt = rng.random((16, 16, 1))
        report = ev({4.0: gt}, {4.0: {"gt": gt}})
        assert report["psnr_4.0"] == float("inf")


class TestDeviceMetrics:
    """jax_metrics must match the host (skimage-semantics) implementations."""

    def test_psnr_matches_host(self, rng):
        from rdst_tpu.metrics import jax_metrics

        gt = rng.random((3, 40, 32, 1)).astype(np.float32)
        pr = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
        dev = np.asarray(jax_metrics.psnr(gt, pr))
        host = [im.psnr(g, p) for g, p in zip(gt, pr)]
        assert np.allclose(dev, host, atol=1e-4)

    def test_ssim_matches_host(self, rng):
        from rdst_tpu.metrics import jax_metrics

        gt = rng.random((3, 40, 32, 1)).astype(np.float64)
        pr = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
        dev = np.asarray(jax_metrics.ssim(gt.astype(np.float32), pr.astype(np.float32)))
        host = [im.ssim(g, p) for g, p in zip(gt, pr)]
        assert np.abs(dev - np.asarray(host)).max() < 1e-3, (dev, host)
