"""Adversarial loss family, restructured for pure-JAX training.

The reference runs the discriminator's optimizer INSIDE loss.forward
(/root/reference/loss/adversarial.py:63-122) — not expressible under
jit. Here the same update math is an explicit alternating step the
trainer owns:

* ``d_step``: gan_k discriminator updates on (stop_grad(fake), real),
  supporting GAN (BCE-with-logits), RaGAN (relativistic), WGAN
  (mean diff + weight clipping), *_GP (R1-style interpolated gradient
  penalty, coefficient 10), and ScaleGAN (L1 against 1 / scale labels);
* ``generator_loss``: the per-type G objective against the (already
  updated) discriminator — same ordering as the reference, which steps
  D before computing loss_g;
* optimizer: Adam(lr=1e-5, betas=(0, 0.9)) for GP variants, else the
  config optimizer (adversarial.py:42-51), with the same LR schedule.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from rdst_tpu.losses.discriminators import build_discriminator
from rdst_tpu.utils.optim import make_optimizer, tree_finite


def _bce_logits(logits, labels):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


class ScaleAdversarial:
    """Owns the discriminator module + its optax transformation."""

    def __init__(self, paras, dtype=jnp.float32):
        self.gan_type = paras.gan_type
        self.gan_k = int(paras.gan_k)
        self.wgan_clip_value = paras.wgan_clip_value
        self.discriminator = build_discriminator(paras, dtype)
        if "GP" in self.gan_type:
            self.tx = optax.adam(1e-5, b1=0.0, b2=0.9, eps=1e-8)
        else:
            self.tx = make_optimizer(paras)
        self.loss_names = ["Adv_G", "Adv_D", "Adv_D Real", "Adv_D Fake"]

    def init(self, rng, example_hr):
        variables = jax.jit(
            lambda r, x: self.discriminator.init(r, x, train=False)
        )(rng, example_hr)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return {"params": params, "batch_stats": batch_stats,
                "opt_state": self.tx.init(params)}

    def _apply(self, params, batch_stats, x, train: bool):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            if train:
                out, updates = self.discriminator.apply(
                    variables, x, train=True, mutable=["batch_stats"])
                return out, updates["batch_stats"]
            return self.discriminator.apply(variables, x, train=False), batch_stats
        return self.discriminator.apply(variables, x, train=train), batch_stats

    def _d_losses(self, params, batch_stats, fake, real, scales):
        d_fake, batch_stats = self._apply(params, batch_stats, fake, True)
        d_real, batch_stats = self._apply(params, batch_stats, real, True)
        if "ScaleGAN" in self.gan_type:
            label_fake = 1.0 / scales
            loss_real = jnp.mean(jnp.abs(d_real - 1.0))
            loss_fake = jnp.mean(jnp.abs(d_fake - label_fake))
        elif "WGAN" in self.gan_type:
            loss_fake = jnp.mean(d_fake)
            loss_real = -jnp.mean(d_real)
        elif "RaGAN" in self.gan_type:
            loss_fake = _bce_logits(d_fake - jnp.mean(d_real), jnp.zeros_like(d_fake))
            loss_real = _bce_logits(d_real - jnp.mean(d_fake), jnp.ones_like(d_real))
        else:
            loss_fake = _bce_logits(d_fake, jnp.zeros_like(d_fake))
            loss_real = _bce_logits(d_real, jnp.ones_like(d_real))
        return loss_fake, loss_real, batch_stats

    def d_step(self, state, fake, real, scales=None, rng=None):
        """gan_k discriminator updates; returns (new_state, report)."""
        fake = jax.lax.stop_gradient(fake)
        params, batch_stats, opt_state = (
            state["params"], state["batch_stats"], state["opt_state"])
        if rng is None and "GP" in self.gan_type:
            # a constant fallback key would pin the GP interpolation draw
            # to the same alpha every step, biasing the penalty estimator
            raise ValueError("d_step needs a per-step rng for GP variants")

        tot_d = tot_real = tot_fake = 0.0
        for k in range(self.gan_k):
            def loss_fn(p):
                loss_fake, loss_real, new_stats = self._d_losses(
                    p, batch_stats, fake, real, scales)
                loss_d = loss_fake + loss_real
                if "GP" in self.gan_type:
                    key = jax.random.fold_in(rng, k)
                    alpha = jax.random.uniform(key, (fake.shape[0], 1, 1, 1))
                    hat = fake * (1 - alpha) + real * alpha

                    def d_sum(h):
                        out, _ = self._apply(p, batch_stats, h, False)
                        return jnp.sum(out)

                    grads = jax.grad(d_sum)(hat)
                    gnorm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2,
                                             axis=1) + 1e-12)
                    loss_d = loss_d + 10.0 * jnp.mean((gnorm - 1.0) ** 2)
                return loss_d, (loss_fake, loss_real, new_stats)

            old_stats = batch_stats
            (loss_d, (loss_fake, loss_real, batch_stats)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params))
            # same finite guard as the generator step: one bad batch
            # with inf/nan D grads would poison d_state (params AND the
            # BN running stats) permanently, making every later G step's
            # adversarial term nan and silently freezing the fine-tune
            ok = tree_finite(grads) & jnp.isfinite(loss_d)
            new_updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, new_updates)
            params, opt_state, batch_stats = jax.lax.cond(
                ok, lambda _: (new_params, new_opt, batch_stats),
                lambda _: (params, opt_state, old_stats), None)
            if self.gan_type == "WGAN":
                c = self.wgan_clip_value
                params = jax.tree.map(lambda p: jnp.clip(p, -c, c), params)
            tot_d = tot_d + loss_d
            tot_real = tot_real + loss_real
            tot_fake = tot_fake + loss_fake

        report = {
            "Adv_D": tot_d / self.gan_k,
            "Adv_D Real": tot_real / self.gan_k,
            "Adv_D Fake": tot_fake / self.gan_k,
        }
        new_state = {"params": params, "batch_stats": batch_stats,
                     "opt_state": opt_state}
        return new_state, report

    def g_loss(self, state, fake, real=None, scales=None):
        d_fake, _ = self._apply(state["params"], state["batch_stats"], fake, False)
        if "RaGAN" in self.gan_type:
            d_real, _ = self._apply(state["params"], state["batch_stats"],
                                    jax.lax.stop_gradient(real), False)
            return 0.5 * (
                _bce_logits(d_fake - jnp.mean(d_real), jnp.ones_like(d_fake))
                + _bce_logits(d_real - jnp.mean(d_fake), jnp.zeros_like(d_real)))
        if "WGAN" in self.gan_type:
            return -jnp.mean(d_fake)
        if "ScaleGAN" in self.gan_type:
            return jnp.mean(jnp.abs(1.0 - d_fake))
        return _bce_logits(d_fake, jnp.ones_like(d_fake))

    # compatibility hook for the SRLoss registry: at loss-composition time
    # the trainer substitutes the live discriminator state via batch aux
    def generator_loss(self, pred, target, batch=None):
        state = batch.get("_adv_state") if batch else None
        if state is None:
            raise RuntimeError(
                "adversarial generator loss needs the trainer to provide the "
                "discriminator state (GAN training path)")
        scales = batch.get("sr_scales") if batch else None
        return self.g_loss(state, pred, target, scales)
