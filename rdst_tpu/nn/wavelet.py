"""2D discrete wavelet transform (native, no pytorch_wavelets).

The reference wraps pytorch_wavelets' DWTForward/DWTInverse
(/root/reference/networks/wavelet_common.py:7-116) for its experimental
wavelet-transformer family. Here the separable DWT/IDWT uses
**periodization** boundaries: per axis, analysis is a circularly-padded
strided correlation (exactly n/2 coefficients per band) and synthesis is
its adjoint (conv_transpose with the same filter + circular fold) —
perfect reconstruction for orthogonal wavelets (haar/db1, db2) on
even-sized inputs, verified to float precision in tests.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2 = math.sqrt(2.0)
_WAVELETS = {
    "haar": np.array([1.0, 1.0]) / _SQRT2,
    "db1": np.array([1.0, 1.0]) / _SQRT2,
    "db2": np.array([
        0.48296291314469025, 0.836516303737469,
        0.22414386804185735, -0.12940952255092145,
    ]),
}


def _filters(name: str) -> Tuple[np.ndarray, np.ndarray]:
    base = _WAVELETS[name]
    dec_lo = base[::-1].copy()
    dec_hi = np.array([(-1) ** k for k in range(len(base))]) * base
    return dec_lo, dec_hi


def _ana1d(x: jax.Array, filt: np.ndarray, axis: int) -> jax.Array:
    """Strided circular correlation along a spatial axis of NHWC."""
    k = len(filt)
    if k > 2:
        pad = k - 2
        if axis == 1:
            x = jnp.concatenate([x, x[:, :pad]], axis=1)
        else:
            x = jnp.concatenate([x, x[:, :, :pad]], axis=2)
    kern = jnp.asarray(filt, x.dtype).reshape((k, 1, 1, 1) if axis == 1 else (1, k, 1, 1))
    kern = jnp.tile(kern, (1, 1, 1, x.shape[-1]))
    strides = (2, 1) if axis == 1 else (1, 2)
    return jax.lax.conv_general_dilated(
        x, kern, strides, "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _syn1d(c: jax.Array, filt: np.ndarray, axis: int, out_size: int) -> jax.Array:
    """Adjoint of _ana1d (scatter + circular fold)."""
    k = len(filt)
    n, hh, ww, ch = c.shape
    cc = c.transpose(0, 3, 1, 2).reshape(n * ch, hh, ww, 1)
    kern = jnp.asarray(filt, c.dtype).reshape((k, 1, 1, 1) if axis == 1 else (1, k, 1, 1))
    strides = (2, 1) if axis == 1 else (1, 2)
    y = jax.lax.conv_transpose(
        cc, kern, strides, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    oh, ow = y.shape[1:3]
    y = y.reshape(n, ch, oh, ow).transpose(0, 2, 3, 1)
    if k > 2:  # circular fold of the overhang
        pad = k - 2
        if axis == 1:
            y = y.at[:, :pad].add(y[:, out_size : out_size + pad])
            y = y[:, :out_size]
        else:
            y = y.at[:, :, :pad].add(y[:, :, out_size : out_size + pad])
            y = y[:, :, :out_size]
    return y


def dwt2(x: jax.Array, wavelet: str = "haar") -> Tuple[jax.Array, jax.Array]:
    """One-level 2D DWT (periodization) of NHWC input with even H, W.

    Returns (ll (N,H/2,W/2,C), bands (N,H/2,W/2,C,3) = LH, HL, HH).
    """
    lo, hi = _filters(wavelet)
    lo_r = _ana1d(x, lo, 1)
    hi_r = _ana1d(x, hi, 1)
    ll = _ana1d(lo_r, lo, 2)
    lh = _ana1d(lo_r, hi, 2)
    hl = _ana1d(hi_r, lo, 2)
    hh = _ana1d(hi_r, hi, 2)
    return ll, jnp.stack([lh, hl, hh], axis=-1)


def idwt2(ll: jax.Array, bands: jax.Array, wavelet: str = "haar") -> jax.Array:
    """Inverse of dwt2 (exact for orthogonal wavelets)."""
    lo, hi = _filters(wavelet)
    lh, hl, hh = bands[..., 0], bands[..., 1], bands[..., 2]
    w_out = 2 * ll.shape[2]
    h_out = 2 * ll.shape[1]
    lo_r = _syn1d(ll, lo, 2, w_out) + _syn1d(lh, hi, 2, w_out)
    hi_r = _syn1d(hl, lo, 2, w_out) + _syn1d(hh, hi, 2, w_out)
    return _syn1d(lo_r, lo, 1, h_out) + _syn1d(hi_r, hi, 1, h_out)


def wavedec2(x: jax.Array, wavelet: str = "haar", level: int = 1):
    """Multi-level DWT: returns (ll, [bands_level1, ..., bands_levelL])."""
    coeffs: List[jax.Array] = []
    ll = x
    for _ in range(level):
        ll, bands = dwt2(ll, wavelet)
        coeffs.append(bands)
    return ll, coeffs


def waverec2(ll: jax.Array, coeffs, wavelet: str = "haar") -> jax.Array:
    for bands in reversed(coeffs):
        ll = idwt2(ll, bands, wavelet)
    return ll
