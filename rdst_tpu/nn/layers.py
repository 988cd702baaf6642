"""Shared layers and initializers.

Numerical-parity notes vs the reference (PyTorch):
* LayerNorm uses eps=1e-5 (torch default; flax default is 1e-6).
* GELU is exact (erf) — torch nn.GELU default; jax.nn.gelu defaults to tanh.
* trunc_normal(std=0.02) matches timm.trunc_normal_ (truncation at ±2σ).
* torch_conv_init reproduces torch Conv2d's kaiming_uniform(a=√5) default
  so training-from-scratch dynamics are comparable.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

trunc_normal_init = jax.nn.initializers.truncated_normal(stddev=0.02)
# torch Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
torch_conv_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class LayerNorm(nn.LayerNorm):
    """LayerNorm with torch-default epsilon."""

    epsilon: float = 1e-5


class Mlp(nn.Module):
    """fc -> GELU -> drop -> fc -> drop (swin_transformer_sr.py:13-29)."""

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def resolve_act(paras, act: Optional[str]) -> Optional[str]:
    """Bake the config's leaky_relu_slope into the act spec string so it
    survives the string-typed plumbing through model attributes (the
    reference reads paras.leaky_relu_slope for its CNN families)."""
    if act == "leaky_relu":
        s = float(paras.get("leaky_relu_slope", 0.2) or 0.2)
        if s != 0.2:
            return f"leaky_relu:{s}"
    return act


def activation(name: Optional[str], slope: float = 0.2) -> Callable:
    if name in (None, "none", "None"):
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if isinstance(name, str) and name.startswith("leaky_relu"):
        if ":" in name:  # 'leaky_relu:<slope>' (see resolve_act)
            slope = float(name.split(":", 1)[1])
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "prelu":  # PReLU-as-fixed-slope fallback (0.25 torch init)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.25)
    if name == "gelu":
        return gelu_exact
    raise ValueError(f"unknown activation: {name}")
