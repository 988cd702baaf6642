"""LPIPS-style perceptual metric (metrics/perceptual.py, r5).

Property-based gates (no published-LPIPS oracle exists for the native
backbone): identity -> 0, monotonicity in corruption strength, blur
sensitivity beyond PSNR's, registry + shape handling.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def imgs(tmp_path_factory):
    rng = np.random.default_rng(7)
    # smooth structured image: random lowpass (per-pixel noise is the
    # one regime feature metrics treat like texture, avoid as base)
    base = rng.random((48, 48, 1)).astype(np.float32)
    for _ in range(3):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5.0
    base = (base - base.min()) / (base.max() - base.min())
    return base, rng


def test_identity_is_zero(imgs):
    from rdst_tpu.metrics.perceptual import lpips

    base, _ = imgs
    assert lpips(base, base) == pytest.approx(0.0, abs=1e-6)


def test_monotone_in_noise(imgs):
    from rdst_tpu.metrics.perceptual import lpips

    base, rng = imgs
    noise = rng.normal(0, 1, base.shape).astype(np.float32)
    d = [lpips(base, np.clip(base + s * noise, 0, 1))
         for s in (0.02, 0.08, 0.25)]
    assert d[0] < d[1] < d[2]
    assert d[0] > 0


def test_blur_registers(imgs):
    """A strong blur must move the metric (texture loss is exactly what
    PSNR under-weighs and this metric exists to see)."""
    from rdst_tpu.metrics.perceptual import lpips

    base, _ = imgs
    blurred = base.copy()
    for _ in range(8):
        blurred = (blurred + np.roll(blurred, 1, 0) + np.roll(blurred, 1, 1)
                   + np.roll(blurred, -1, 0) + np.roll(blurred, -1, 1)) / 5.0
    assert lpips(base, blurred) > 5 * lpips(base, np.clip(base + 0.01, 0, 1))


def test_registry_and_shapes(imgs):
    from rdst_tpu.metrics.image_metrics import METRIC_FUNCS

    base, rng = imgs
    assert "lpips" in METRIC_FUNCS
    fn = METRIC_FUNCS["lpips"]
    # odd (non-/16) spatial shape exercises the reflect-pad path;
    # 3-channel and 2D grayscale exercise canonicalization
    a = rng.random((37, 41, 3)).astype(np.float32)
    b = np.clip(a + 0.05 * rng.normal(0, 1, a.shape).astype(np.float32), 0, 1)
    assert fn(a, b) > 0
    g = rng.random((40, 40)).astype(np.float32)
    assert fn(g, g) == pytest.approx(0.0, abs=1e-6)


def test_uses_committed_backbone():
    """The committed native substitute must actually load (a silent
    fall-through to random init would make every quoted number a
    different metric)."""
    import os

    from rdst_tpu.metrics.perceptual import _backbone

    if not os.path.exists("weights/vgg19_features_native.pkl"):
        pytest.skip("native VGG blob not present")
    variables, width, _ = _backbone()
    assert width == pytest.approx(0.25)
    assert "conv_15" in variables["params"]  # deepest conv below tap 36
