"""Image-op tests: host crops/padding semantics, and numerical parity of
the JAX device path against the cv2 host path (which defines the task)."""

import cv2
import numpy as np
import pytest

from rdst_tpu.data import ops
from rdst_tpu.data.ops_jax import (
    gaussian_blur_nhwc,
    gaussian_kernel_1d,
    resample_matrix,
    resize_nhwc,
)


class TestHostOps:
    def test_normalize(self, rng):
        x = rng.normal(10, 5, (8, 8, 1))
        y, lo, hi = ops.normalize(x)
        assert y.min() == 0 and y.max() == 1
        assert np.allclose(y * (hi - lo) + lo, x)

    def test_resize_keeps_channel_axis(self, rng):
        x = rng.random((32, 24, 1)).astype(np.float32)
        y = ops.resize(x, (8, 6))
        assert y.shape == (8, 6, 1)
        y = ops.resize(x, (32, 24))
        assert y is x  # no-op shortcut

    def test_resize_float_scale(self, rng):
        x = rng.random((20, 20, 1)).astype(np.float32)
        y = ops.resize(x, 0.5)
        assert y.shape == (10, 10, 1)

    def test_random_crop_respects_margin(self, rng):
        x = np.arange(100, dtype=np.float32).reshape(10, 10)
        for _ in range(20):
            y = ops.random_crop(x, 4, margin=2, rng=rng)
            assert y.shape == (4, 4)
            # values inside margin region only
            rows = y[:, 0] // 10
            assert rows.min() >= 2 and rows.max() <= 7

    def test_margin_trim(self):
        x = np.zeros((10, 12))
        assert ops.random_crop(x, 0, margin=(2, 3)).shape == (6, 6)

    def test_paired_crop_alignment(self, rng):
        lr = np.arange(64, dtype=np.float32).reshape(8, 8)
        hr = np.kron(lr, np.ones((4, 4), dtype=np.float32))
        lpatch, hpatch = ops.paired_random_crop(lr, hr, 4, 4, margin=0, rng=rng)
        assert lpatch.shape == (4, 4) and hpatch.shape == (16, 16)
        assert np.array_equal(np.kron(lpatch, np.ones((4, 4))), hpatch)

    def test_centre_crop(self):
        x = np.arange(36).reshape(6, 6)
        y = ops.centre_crop(x, 2)
        assert np.array_equal(y, x[2:4, 2:4])

    def test_image_padding_roundtrip(self, rng):
        x = rng.random((144, 200, 1))
        p = ops.ImagePadding([144, 200], 192)
        xp = p.pad(x)
        assert xp.shape == (192, 200, 1)
        assert np.array_equal(p.ipad(xp), x)


class TestJaxResizeParity:
    """The JAX resize must match cv2 (which defines the LR inputs)."""

    @pytest.mark.parametrize("method,cv2_flag", [
        ("cubic", cv2.INTER_CUBIC),
        ("linear", cv2.INTER_LINEAR),
    ])
    @pytest.mark.parametrize("shape,out", [
        ((96, 96), (24, 24)),   # x4 down (LR generation)
        ((24, 24), (96, 96)),   # x4 up
        ((160, 128), (40, 32)),  # OASIS slice x4 down
        ((33, 47), (13, 29)),   # awkward sizes
    ])
    def test_matches_cv2(self, rng, method, cv2_flag, shape, out):
        x = rng.random(shape).astype(np.float32)
        ref = cv2.resize(x, (out[1], out[0]), interpolation=cv2_flag)
        got = np.asarray(resize_nhwc(x[None, :, :, None], out, method))[0, :, :, 0]
        assert np.abs(got - ref).max() < 2e-5, np.abs(got - ref).max()

    def test_nearest_matches_cv2(self, rng):
        x = rng.random((32, 32)).astype(np.float32)
        ref = cv2.resize(x, (8, 8), interpolation=cv2.INTER_NEAREST)
        got = np.asarray(resize_nhwc(x[None, :, :, None], (8, 8), "nearest"))[0, :, :, 0]
        assert np.array_equal(got, ref)

    def test_matrix_rows_sum_to_one(self):
        m = resample_matrix(37, 11, "cubic")
        assert np.allclose(m.sum(1), 1.0, atol=1e-6)


class TestGaussianBlurParity:
    def test_kernel_matches_cv2(self):
        for k in (3, 5, 7, 9):
            for s in (0.0, 1.5):
                ref = cv2.getGaussianKernel(k, s).ravel()
                got = gaussian_kernel_1d(k, s)
                assert np.allclose(got, ref, atol=1e-6), (k, s)

    def test_blur_matches_cv2(self, rng):
        x = rng.random((24, 24)).astype(np.float32)
        ref = cv2.GaussianBlur(x, (3, 3), 0)
        got = np.asarray(gaussian_blur_nhwc(x[None, :, :, None], 3, 0))[0, :, :, 0]
        assert np.abs(got - ref).max() < 1e-5


class TestFolding:
    def test_unfold_fold_roundtrip(self, rng):
        from rdst_tpu.data.folding import ImageFolder

        x = rng.random((1, 40, 32, 1)).astype(np.float32)
        f = ImageFolder((1, 40, 32, 1), patch_size=24, stride=24)
        patches = f.unfold(x)
        rec = np.asarray(f.fold(patches))
        assert np.abs(rec - x).max() < 1e-6

    def test_overlapping_roundtrip(self, rng):
        from rdst_tpu.data.folding import ImageFolder

        x = rng.random((1, 40, 32, 2)).astype(np.float32)
        f = ImageFolder((1, 40, 32, 2), patch_size=16, stride=8)
        rec = np.asarray(f.fold(f.unfold(x)))
        assert np.abs(rec - x).max() < 1e-6

    def test_matches_torch_unfold(self, rng):
        torch = pytest.importorskip("torch")
        from rdst_tpu.data.folding import ImageFolder

        x = rng.random((1, 40, 32, 1)).astype(np.float32)
        f = ImageFolder((1, 40, 32, 1), patch_size=24, stride=24)
        # reference computes the same auto-padding then runs torch Unfold
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tu = torch.nn.Unfold((24, 24), 1, f.padding, (24, 24))
        ref = tu(xt).transpose(1, 2).reshape(-1, 1, 24, 24).numpy()
        got = np.asarray(f.unfold(x)).transpose(0, 3, 1, 2)
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-6
