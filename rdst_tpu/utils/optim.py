"""Optimizer + LR schedule factories (optax).

Mirrors the reference factories (/root/reference/utils/optim.py:30-75):
* opt ∈ {Adam, SGD, RMSprop} with lr / weight_decay / betas / eps / momentum
* lr_decay_type 'step N' -> StepLR, 'milestones a b c' -> MultiStepLR
  with lr_decay_gamma; anything else -> constant LR.

The schedule is baked into the optax chain (the scheduler "step" happens
per optimizer step, matching the reference's epoch==step bookkeeping).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def tree_finite(tree) -> "jnp.ndarray":
    """In-graph scalar: every leaf of ``tree`` is finite.

    Shared by the generator and discriminator step guards: a finite
    loss does NOT imply finite grads — one inf/nan leaf (e.g. backward
    overflow through LayerNorm on an exactly-constant patch) would
    poison the params forever, freezing training behind a loss-only
    guard from then on.
    """
    ok = jnp.array(True)
    for g in jax.tree.leaves(tree):
        ok &= jnp.isfinite(g).all()
    return ok


def make_schedule(paras) -> optax.Schedule:
    base_lr = paras.learning_rate
    decay_type: Optional[str] = paras.get("lr_decay_type")
    gamma = paras.get("lr_decay_gamma", 0.5)
    if not decay_type:
        return optax.constant_schedule(base_lr)
    parts = str(decay_type).split()
    if parts[0] == "step" and len(parts) == 2:
        step = int(parts[1])
        return lambda count: base_lr * (gamma ** (count // step))
    if parts[0] == "milestones" and len(parts) > 1:
        milestones = [int(m) for m in parts[1:]]
        boundaries = {m: gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    return optax.constant_schedule(base_lr)


def make_optimizer(paras) -> optax.GradientTransformation:
    schedule = make_schedule(paras)
    opt_name = paras.opt
    wd = paras.get("weight_decay", 0) or 0
    if opt_name == "Adam":
        tx = optax.adam(schedule, b1=paras.beta1, b2=paras.beta2, eps=paras.epsilon)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif opt_name == "SGD":
        tx = optax.sgd(schedule, momentum=paras.momentum)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif opt_name == "RMSprop":
        tx = optax.rmsprop(schedule, eps=paras.epsilon, momentum=paras.momentum)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    else:
        raise ValueError(f"Optimizer {opt_name} not supported (Adam/SGD/RMSprop)")
    return tx


class Timer:
    """tic/toc accumulator (reference utils/optim.py:6-27)."""

    def __init__(self):
        self.acc = 0.0
        self.t0 = time.time()

    def tic(self):
        self.t0 = time.time()

    def toc(self) -> float:
        return time.time() - self.t0

    def hold(self):
        self.acc += self.toc()

    def release(self) -> float:
        ret = self.acc
        self.acc = 0.0
        return ret
