"""Patch tiling for whole-image inference (unfold / fold).

Replaces the reference's torch.nn.Unfold/Fold machinery
(/root/reference/datasets/basic_dataset.py:347-449) with NHWC-layout
static-index gathers and scatter-adds: patch grid positions are computed
on the host per (image, patch, stride) signature, so the jitted apply has
fully static shapes (XLA requirement) and the fold's overlap-count
normalization is a precomputed reciprocal multiply.
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Size2 = Tuple[int, int]


def _pair(v) -> Size2:
    if isinstance(v, (int, np.integer)):
        return int(v), int(v)
    return int(v[0]), int(v[1])


def _positions(size: int, kernel: int, stride: int, padding: int) -> np.ndarray:
    count = (size + 2 * padding - kernel) // stride + 1
    return -padding + stride * np.arange(count)


class ImageFolder:
    """Tile an NHWC image into patches and reassemble with overlap averaging.

    Padding is auto-computed so the stride grid covers the image (same rule
    as the reference ImageFolder, basic_dataset.py:427-433). ``unfold``
    maps (N,H,W,C) -> (N*P, ph, pw, C); ``fold`` inverts it, dividing by
    the per-pixel overlap count.
    """

    def __init__(
        self,
        image_size: Tuple[int, int, int, int],  # N, H, W, C (NHWC)
        patch_size: Union[int, Size2],
        stride: Union[int, Size2] = 1,
    ):
        n, h, w, c = (int(v) for v in image_size)
        ph, pw = _pair(patch_size)
        sh, sw = _pair(stride)
        # auto padding so that the stride grid tiles the full image
        margin = [
            h - ((h - 1 - (ph - 1)) // sh + 1) * sh,
            w - ((w - 1 - (pw - 1)) // sw + 1) * sw,
        ]
        pad = tuple(0 if m == 0 else math.ceil((p - m) / 2) for m, p in zip(margin, (ph, pw)))

        self.image_size = (n, h, w, c)
        self.patch_size = (ph, pw)
        self.stride = (sh, sw)
        self.padding = pad
        self.hs = _positions(h, ph, sh, pad[0])
        self.ws = _positions(w, pw, sw, pad[1])
        self.num_patches = len(self.hs) * len(self.ws)

        ones = np.ones(self.image_size, dtype=np.float32)
        divisor = np.asarray(self._fold_raw(jnp.asarray(self.unfold(jnp.asarray(ones)))))
        self.inv_divisor = jnp.asarray(1.0 / np.maximum(divisor, 1e-12))

    # row/col gather indices into the zero-padded image
    def _indices(self):
        ph, pw = self.patch_size
        r = self.hs[:, None] + np.arange(ph)[None, :] + self.padding[0]  # (Lh, ph)
        c = self.ws[:, None] + np.arange(pw)[None, :] + self.padding[1]  # (Lw, pw)
        return r, c

    def unfold(self, x: jax.Array) -> jax.Array:
        """(N,H,W,C) -> (N*Lh*Lw, ph, pw, C), row-major patch order."""
        n, h, w, c = x.shape
        p0, p1 = self.padding
        xp = jnp.pad(x, ((0, 0), (p0, p0), (p1, p1), (0, 0)))
        r, cidx = self._indices()
        ph, pw = self.patch_size
        patches = xp[:, r[:, None, :, None], cidx[None, :, None, :], :]
        # (N, Lh, Lw, ph, pw, C)
        return patches.reshape(n * len(self.hs) * len(self.ws), ph, pw, c)

    def _fold_raw(self, patches: jax.Array) -> jax.Array:
        n, h, w, c = self.image_size
        p0, p1 = self.padding
        ph, pw = self.patch_size
        lh, lw = len(self.hs), len(self.ws)
        patches = patches.reshape(n, lh, lw, ph, pw, c)
        out = jnp.zeros((n, h + 2 * p0, w + 2 * p1, c), dtype=patches.dtype)
        r, cidx = self._indices()
        out = out.at[:, r[:, None, :, None], cidx[None, :, None, :], :].add(patches)
        return out[:, p0 : p0 + h, p1 : p1 + w, :]

    def fold(self, patches: jax.Array) -> jax.Array:
        """(N*P, ph, pw, C) -> (N,H,W,C) with overlap-count normalization."""
        return self._fold_raw(patches) * self.inv_divisor

    # reference-compatible accessors
    def get_unfolder(self):
        return self.unfold

    def get_folder(self):
        return self.fold
