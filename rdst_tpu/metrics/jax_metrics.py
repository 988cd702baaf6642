"""Device-side (JAX) quality metrics for the hot evaluation path.

PSNR and SSIM computed on-device so quick-eval and benchmarking fetch
only scalars (the dev tunnel's device->host bandwidth makes full-volume
readbacks ~100x more expensive than the SR compute itself). Numerics
match the host implementations in image_metrics.py (skimage semantics:
data_range, win_size=7 uniform filter, sample covariance), gated by
tests/test_metrics.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(gt: jax.Array, pred: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-image PSNR over NHWC batches -> (N,) array."""
    axes = tuple(range(1, gt.ndim))
    mse = jnp.mean((gt - pred) ** 2, axis=axes)
    return 10.0 * jnp.log10((data_range**2) / mse)


def _uniform_filter_2d(x: jax.Array, win: int) -> jax.Array:
    """Uniform filter with reflect padding over (N,H,W) stacks, matching
    scipy.ndimage.uniform_filter's centering for odd windows."""
    pad = win // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    c = jnp.cumsum(jnp.cumsum(xp, axis=1), axis=2)
    c = jnp.pad(c, ((0, 0), (1, 0), (1, 0)))
    h, w = x.shape[1], x.shape[2]
    s = (
        c[:, win : win + h, win : win + w]
        - c[:, :h, win : win + w]
        - c[:, win : win + h, :w]
        + c[:, :h, :w]
    )
    return s / (win * win)


def ssim(gt: jax.Array, pred: jax.Array, data_range: float = 1.0,
         win_size: int = 7) -> jax.Array:
    """Per-image channel-averaged SSIM over NHWC batches -> (N,)."""
    n, h, w, c = gt.shape
    gt2 = gt.transpose(0, 3, 1, 2).reshape(n * c, h, w).astype(jnp.float32)
    pr2 = pred.transpose(0, 3, 1, 2).reshape(n * c, h, w).astype(jnp.float32)

    npix = win_size**2
    cov_norm = npix / (npix - 1)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    ux = _uniform_filter_2d(gt2, win_size)
    uy = _uniform_filter_2d(pr2, win_size)
    uxx = _uniform_filter_2d(gt2 * gt2, win_size)
    uyy = _uniform_filter_2d(pr2 * pr2, win_size)
    uxy = _uniform_filter_2d(gt2 * pr2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    s = s[:, pad : h - pad, pad : w - pad]
    return s.reshape(n, c, *s.shape[1:]).mean(axis=(1, 2, 3))


def crop_margin(x: jax.Array, margin: int) -> jax.Array:
    """SR scoring margin rule (= ceil(scale) px, sr_metrics.py:54-63)."""
    if margin == 0:
        return x
    return x[:, margin:-margin, margin:-margin, :]
