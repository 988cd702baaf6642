"""Meta-Upscale module: arbitrary-scale SR (Meta-SR, CVPR'19).

Re-design of /root/reference/networks/meta_upscale.py:6-188 with all
index math resolved at trace time:

* a tiny MLP (Pos2Weight) predicts a 3x3xC->outC conv kernel per
  fractional sub-position from (1/r, dh, dw);
* the reference computes a projection-coordinate matrix + validity mask
  with host loops, predicts weights for the small periodic tile, tiles
  them over the output grid, and mask-selects valid pixels — here the
  same construction runs in numpy per (inH, inW, r) signature and the
  apply is one einsum over gathered 3x3 patches (static shapes, no
  masked_select);
* ``sr_scale`` must be a static Python float — each requested scale
  compiles one lean program (the training scale set is small).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rdst_tpu.nn.layers import trunc_normal_init


def _axis_offsets(in_size: int, scale: float, scale_int: int):
    """The reference's per-axis offset/mask construction
    (input_matrix_wpn_new, meta_upscale.py:102-147)."""
    out_size = int(scale * in_size)
    offset = np.ones((in_size, scale_int))
    mask = np.zeros((in_size, scale_int))
    project = np.arange(out_size) / scale
    int_project = np.floor(project).astype(int)
    frac = project - int_project
    flag, number = 0, 0
    for i in range(out_size):
        if int_project[i] == number:
            offset[int_project[i], flag] = frac[i]
            mask[int_project[i], flag] = 1
            flag += 1
        else:
            offset[int_project[i], 0] = frac[i]
            mask[int_project[i], 0] = 1
            number += 1
            flag = 1
    return offset.reshape(-1), mask.reshape(-1)


@functools.lru_cache(maxsize=128)
def meta_upscale_plan(in_h: int, in_w: int, scale: float):
    """Static plan: (pos_small (P,3), tile_idx (outHg,outWg), valid_idx)."""
    scale_int = int(math.ceil(scale))
    h_off, h_mask = _axis_offsets(in_h, scale, scale_int)
    w_off, w_mask = _axis_offsets(in_w, scale, scale_int)

    pos = np.stack(np.meshgrid(h_off, w_off, indexing="ij"), axis=-1)  # (Hg, Wg, 2)
    mask = (h_mask[:, None] + w_mask[None, :]) == 2

    # periods of the unique offset tile (meta_upscale.py:169-181)
    i = 1
    while i < pos.shape[0] and pos[i, 0, 0] >= 1e-6:
        i += 1
    j = 1
    while j < pos.shape[1] and pos[0, j, 1] >= 1e-6:
        j += 1
    pos_small = pos[:i, :j].reshape(-1, 2)
    pos_small = np.concatenate(
        [np.full((pos_small.shape[0], 1), 1.0 / scale), pos_small], axis=1
    ).astype(np.float32)

    out_hg, out_wg = scale_int * in_h, scale_int * in_w
    rows = np.arange(out_hg) % i
    cols = np.arange(out_wg) % j
    tile_idx = rows[:, None] * j + cols[None, :]  # (outHg, outWg) -> P

    valid_idx = np.where(mask.reshape(-1))[0].astype(np.int32)
    return pos_small, tile_idx.astype(np.int32), valid_idx


class Pos2Weight(nn.Module):
    """(1/r, dh, dw) -> 3x3 * inC * outC kernel entries (meta_upscale.py:6-20)."""

    in_c: int
    out_c: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pos):
        x = nn.Dense(256, dtype=self.dtype, kernel_init=trunc_normal_init, name="fc1")(pos)
        x = jax.nn.relu(x)
        return nn.Dense(self.kernel_size**2 * self.in_c * self.out_c,
                        dtype=self.dtype, kernel_init=trunc_normal_init, name="fc2")(x)


def _extract_patches_3x3(x: jax.Array) -> jax.Array:
    """(N,H,W,C) -> (N,H,W,9C) zero-padded 3x3 neighborhoods.

    Channel layout matches torch unfold: index = (di*3+dj)*C + c is the
    torch (C,di,dj) flatten... torch unfold flattens (C, kH, kW) with C
    slowest: index = c*9 + di*3 + dj. We build that layout directly so
    imported Pos2Weight kernels line up.
    """
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, di : di + h, dj : dj + w, :] for di in range(3) for dj in range(3)]
    stacked = jnp.stack(taps, axis=-1)  # (N,H,W,C,9)
    return stacked.reshape(n, h, w, c * 9)


class MetaUpSampler(nn.Module):
    """Arbitrary-scale upsampling head (meta_upscale.py:23-100)."""

    out_c: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lr_features: jax.Array, sr_scale) -> jax.Array:
        if hasattr(sr_scale, "ndim"):  # accept (N,1) arrays of equal scales
            sr_scale = float(np.asarray(sr_scale).reshape(-1)[0])
        scale = float(sr_scale)
        n, in_h, in_w, c = lr_features.shape
        scale_int = int(math.ceil(scale))
        out_h, out_w = int(scale * in_h), int(scale * in_w)

        pos_small, tile_idx, valid_idx = meta_upscale_plan(in_h, in_w, scale)

        weights = Pos2Weight(in_c=c, out_c=self.out_c, kernel_size=self.kernel_size,
                             dtype=self.dtype, name="P2W")(jnp.asarray(pos_small))
        # (P, 9*C*outC) -> torch layout (kk*inC, outC)
        weights = weights.reshape(pos_small.shape[0], c * 9, self.out_c)

        patches = _extract_patches_3x3(lr_features)  # (N, H, W, 9C)
        w_tiled = weights[jnp.asarray(tile_idx)]  # (outHg, outWg, 9C, outC)
        w_tiled = w_tiled.reshape(in_h, scale_int, in_w, scale_int, c * 9, self.out_c)

        out = jnp.einsum("nhwk,hawbko->nhawbo", patches, w_tiled)
        out = out.reshape(n, scale_int * in_h, scale_int * in_w, self.out_c)
        flat = out.reshape(n, -1, self.out_c)
        flat = jnp.take(flat, jnp.asarray(valid_idx), axis=1)
        return flat.reshape(n, out_h, out_w, self.out_c)
