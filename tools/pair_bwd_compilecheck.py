#!/usr/bin/env python
"""Compile-only check of the pair-train BACKWARD program on the TPU
backend at the flagship train geometry (24x24 tokens, ws 8, C=60,
nH=6, DropPath columns on). The r3 hardware run of bench_all record 9
died in Mosaic ('Invalid input layout' on a (1x120)->(576x120)
vector.broadcast); this reproduces that compile in seconds (the AOT
helper is chipless) so kernel fixes can iterate without a trainer
setup. Exit 0 = both fwd+bwd compile."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rdst_tpu.kernels.pair_train import fused_swin_pair_train


def main():
    c, nh, ws, hw = 60, 6, 8, 24
    hidden = 2 * c
    n = ws * ws
    nw = (hw // ws) ** 2
    b = 4  # images
    rng = np.random.default_rng(0)

    def t(*s):
        return jnp.asarray(rng.standard_normal(s), jnp.float32)

    params = [t(c, 3 * c), t(3 * c), t(c, c), t(c), t(c), t(c),
              t(c), t(c), t(c, hidden), t(hidden), t(hidden, c), t(c)]
    bias = t(nh, n, n)             # unshifted: rel-pos only (bw=1)
    bias_b = t(nh * nw, n, n)      # shifted: per-window mask (bw=nw)
    x = jnp.asarray(rng.standard_normal((b * nw, n, c)), jnp.bfloat16)
    dpf = jnp.ones((b * nw * n, 4), jnp.float32)

    def loss(x, pa, ba, pb, bb, dpf):
        y = fused_swin_pair_train(
            x, pa, ba, pb, bb, dpf, num_heads=nh, x_size=(hw, hw),
            window_size=ws, shift=ws // 2, images_per_program=1)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    lowered = g.lower(x, params, bias, params, bias_b, dpf)
    lowered.compile()
    print("pair-train fwd+bwd compiled OK on", jax.devices()[0].platform)


if __name__ == "__main__":
    main()
