"""Device-side (JAX) image ops, numerically gated against the cv2 host path.

TPU-first design: resampling is expressed as two small dense matmuls
(row-weights @ image @ col-weights^T) instead of per-pixel gathers — the
weight matrices are built once per (in, out) size pair on the host, and
the apply is a pair of MXU-friendly einsums that XLA fuses with
surrounding elementwise work. This is what makes "HBM-resident
preprocessing" viable: LR generation for a whole batch of slices is one
fused kernel instead of a CPU loop.

Parity: matches cv2.resize INTER_CUBIC/INTER_LINEAR (A=-0.75 bicubic
kernel, half-pixel centers, replicated borders) and cv2.GaussianBlur
(incl. the fixed small-kernel tables for sigma<=0, REFLECT_101 border);
see tests/test_ops.py for the numerical gates vs the reference semantics
(/root/reference/datasets/basic_dataset.py:64-123).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Bicubic convolution kernel with cv2's A=-0.75."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resample_matrix(in_size: int, out_size: int, method: str = "cubic") -> np.ndarray:
    """Dense (out_size, in_size) 1-D resampling matrix, cv2-compatible.

    Half-pixel center mapping src = (dst + 0.5) * in/out - 0.5 with
    border-replicate tap clamping (out-of-range tap weight folds onto the
    clamped border sample, exactly like cv2's border handling).
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base

    if method == "cubic":
        offsets = np.arange(-1, 3)
    elif method == "linear":
        offsets = np.arange(0, 2)
    elif method == "nearest":
        m = np.zeros((out_size, in_size), dtype=np.float32)
        # cv2 INTER_NEAREST uses floor(dst * scale) (legacy, not half-pixel)
        idx = np.minimum(np.floor(dst * scale).astype(np.int64), in_size - 1)
        m[np.arange(out_size), idx] = 1.0
        return m
    else:
        raise ValueError(f"unknown resample method: {method}")

    taps = base[:, None] + offsets[None, :]  # (out, k)
    if method == "cubic":
        w = _cubic_kernel(frac[:, None] - offsets[None, :])
    else:
        w = np.stack([1.0 - frac, frac], axis=1)
    # normalize (cubic weights already sum to 1; guard fp drift)
    w = w / w.sum(axis=1, keepdims=True)
    taps = np.clip(taps, 0, in_size - 1)

    m = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(m, (np.repeat(np.arange(out_size), len(offsets)), taps.ravel()), w.ravel())
    return m.astype(np.float32)


def resize_nhwc(
    x: jax.Array,
    size: Tuple[int, int],
    method: str = "cubic",
) -> jax.Array:
    """Resize an NHWC batch to spatial ``size`` (H, W), cv2-compatible.

    Jit-friendly: matrices are compile-time constants per (shape, size).
    """
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x
    rm = jnp.asarray(resample_matrix(h, oh, method))
    cm = jnp.asarray(resample_matrix(w, ow, method))
    y = jnp.einsum("oh,nhwc->nowc", rm, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,nowc->nopc", cm, y, precision=jax.lax.Precision.HIGHEST)
    return y


# -- gaussian blur -----------------------------------------------------------

_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


@functools.lru_cache(maxsize=64)
def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics, incl. fixed small-kernel tables.

    Delegates to cv2 when importable so the device path is bit-identical
    to whatever cv2 build generated the training data; the analytic
    formula is the standalone fallback.
    """
    try:
        import cv2

        return cv2.getGaussianKernel(ksize, sigma).ravel().astype(np.float32)
    except ImportError:
        pass
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize].astype(np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    i = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_nhwc(x: jax.Array, ksize: int = 3, sigma: float = 0.0) -> jax.Array:
    """Separable gaussian blur with REFLECT_101 border (cv2 default)."""
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # rows
    y = sum(k[i] * xp[:, i : i + x.shape[1], pad : pad + x.shape[2], :] for i in range(ksize))
    yp = jnp.pad(y, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = sum(k[i] * yp[:, :, i : i + x.shape[2], :] for i in range(ksize))
    return y


def make_lr_batch(
    hr: jax.Array,
    lr_size: Tuple[int, int],
    blur_method: Optional[str] = None,
    blur_kernel: int = 3,
    blur_sigma: float = 0.0,
) -> jax.Array:
    """HBM-resident LR synthesis: bicubic downscale (+ optional blur)."""
    lr = resize_nhwc(hr, lr_size, "cubic")
    if blur_method == "gaussian":
        lr = gaussian_blur_nhwc(lr, blur_kernel, blur_sigma)
    return lr
