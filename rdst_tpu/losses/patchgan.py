"""Conditional PatchGAN discriminator + GANLoss
(/root/reference/networks/PatchGAN.py:12-160).

The PatchGAN scores concatenated (condition, image) pairs with a
stride-2 conv pyramid producing a patch-level prediction map
(InstanceNorm, LeakyReLU 0.2, 4x4 kernels). GANLoss covers
lsgan (MSE), vanilla (BCE-with-logits), and wgangp (mean) modes with
the standard mixed-interpolation gradient penalty helper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from rdst_tpu.nn.layers import torch_conv_init


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization (torch InstanceNorm2d,
    affine=False default)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.epsilon)


class PatchGAN(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img_a, img_b):
        x = jnp.concatenate([img_a, img_b], axis=-1)
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)  # noqa: E731

        def conv(v, feats, stride, name, use_bias=True):
            return nn.Conv(feats, (4, 4), (stride, stride), padding=1,
                           use_bias=use_bias, kernel_init=torch_conv_init,
                           dtype=self.dtype, name=name)(v)

        x = lrelu(conv(x, self.ndf, 2, "conv_0"))
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            x = conv(x, self.ndf * nf, 2, f"conv_{n}")
            x = InstanceNorm()(x)
            x = lrelu(x)
        nf = min(2**self.n_layers, 8)
        x = conv(x, self.ndf * nf, 1, f"conv_{self.n_layers}")
        x = InstanceNorm()(x)
        x = lrelu(x)
        return conv(x, 1, 1, "conv_out")  # patch prediction map


class GANLoss:
    """Target-label abstraction (PatchGAN.py:59-127)."""

    def __init__(self, gan_mode: str, target_real: float = 1.0, target_fake: float = 0.0):
        assert gan_mode in ("lsgan", "vanilla", "wgangp")
        self.gan_mode = gan_mode
        self.target_real = target_real
        self.target_fake = target_fake

    def __call__(self, prediction, target_is_real: bool):
        if self.gan_mode == "wgangp":
            return -prediction.mean() if target_is_real else prediction.mean()
        target = jnp.full_like(
            prediction, self.target_real if target_is_real else self.target_fake)
        if self.gan_mode == "lsgan":
            return jnp.mean((prediction - target) ** 2)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(prediction, target))


def gradient_penalty(d_apply, real, fake, rng, constant: float = 1.0,
                     lambda_gp: float = 10.0, mode: str = "mixed"):
    """Mixed-interpolation gradient penalty (PatchGAN.py:129-160)."""
    if mode == "real":
        hat = real
    elif mode == "fake":
        hat = fake
    else:
        alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
        hat = alpha * real + (1 - alpha) * fake

    def d_sum(h):
        return jnp.sum(d_apply(h))

    grads = jax.grad(d_sum)(hat)
    gnorm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1) + 1e-16)
    return lambda_gp * jnp.mean((gnorm - constant) ** 2)
