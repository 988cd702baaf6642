"""Native (C++) data-path backend: parity gates vs cv2/numpy.

rdst_tpu/native auto-builds image_ops.cpp with g++ and serves the
bicubic-resize + dihedral primitives behind RDST_TPU_NATIVE=1 (or
whenever cv2 is absent)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rdst_tpu import native  # noqa: E402
from rdst_tpu.data import ops  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _built():
    if not native.available():
        pytest.skip("no C++ toolchain available")


class TestNativeResize:
    @pytest.mark.parametrize("shape,out", [
        ((96, 96, 1), (24, 24)),    # HR -> LR synthesis (the SR task def)
        ((40, 32, 1), (160, 128)),  # bicubic-mode upscale
        ((37, 53, 3), (24, 24)),    # odd sizes, multi-channel
        ((17, 13, 1), (51, 39)),    # non-integer scale
    ])
    def test_matches_cv2_inter_cubic(self, rng, shape, out):
        img = rng.random(shape).astype(np.float32)
        want = cv2.resize(img, dsize=(out[1], out[0]),
                          interpolation=cv2.INTER_CUBIC)
        if want.ndim == 2:
            want = want[:, :, None]
        got = native.resize_bicubic(img, out)
        assert np.abs(got - want).max() < 2e-6

    def test_ops_resize_backend_switch(self, rng, monkeypatch):
        img = rng.random((32, 24, 1)).astype(np.float32)
        base = ops.resize(img, (8, 6), "cubic")
        monkeypatch.setenv("RDST_TPU_NATIVE", "1")
        nat = ops.resize(img, (8, 6), "cubic")
        assert np.abs(nat - base).max() < 2e-6


class TestNativeDihedral:
    def test_matches_numpy_all_eight(self, rng, monkeypatch):
        img = rng.random((9, 7, 2)).astype(np.float32)
        wants = [np.ascontiguousarray(
            np.rot90(img[:, ::-1] if k >= 4 else img, k % 4))
            for k in range(8)]
        monkeypatch.setenv("RDST_TPU_NATIVE", "1")
        for k, want in enumerate(wants):
            got = ops.dihedral(img, k)
            assert got.shape == want.shape
            np.testing.assert_array_equal(got, want)
