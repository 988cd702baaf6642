"""SR loss registry with multi-stage scalars.

Re-design of the reference loss subsystem (/root/reference/loss/
sr_loss.py:10-72, basic_loss.py:13-90) as pure functions compatible with
one jitted train step:

* built from ``training_losses`` (L1/L2/MSE, VGG22/VGG54, Minc_VGG*,
  '*GAN*', 'UNet-F') with per-training-state scalars from
  ``loss_scalars``;
* every term is ``term(pred, target, batch, term_params, rng) -> scalar``
  where ``term_params`` carries frozen feature-extractor weights (VGG,
  seg-UNet) or the live discriminator (GAN);
* the reference's "optimizer.step() inside loss.forward" GAN pattern is
  restructured into an explicit alternating D/G step owned by the
  trainer (see losses/adversarial.py) — same update math, expressible
  in pure JAX;
* per-state loss records (mean-report tables) are kept host-side.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np
from tabulate import tabulate


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


class SRLoss:
    """Builds loss terms from config; callable per training state.

    Pure-functional core: ``total, report = loss(pred, batch, state=...)``
    where pred/targets are NHWC device arrays. Auxiliary trainable state
    (GAN discriminator) is owned by the trainer via ``self.adversarial``.
    """

    def __init__(self, paras, seg_unet_params=None, vgg_params=None):
        self.loss_scalars: Dict[str, Dict[str, float]] = {
            state: dict(scalars) for state, scalars in paras.loss_scalars.items()
        }
        self.training_states = list(paras.training_states)
        self.current_state = self.training_states[0]
        self.terms: Dict[str, Callable] = {}
        self.adversarial = None
        self.records: Dict[str, Dict[str, list]] = {
            s: {} for s in self.training_states
        }

        for name in paras.training_losses:
            if name in ("L1",):
                self.terms[name] = lambda p, t, b=None: l1_loss(p, t)
            elif name in ("L2", "MSE"):
                self.terms[name] = lambda p, t, b=None: l2_loss(p, t)
            elif name.startswith("VGG") or name.startswith("Minc_VGG"):
                from rdst_tpu.losses.vgg import VGGLoss

                self.terms[name] = VGGLoss(name, vgg_params)
            elif "GAN" in name:
                from rdst_tpu.losses.adversarial import ScaleAdversarial

                self.adversarial = ScaleAdversarial(paras)
                self.terms[name] = self.adversarial.generator_loss
            elif name == "UNet-F":
                from rdst_tpu.losses.seg_unet import SegUNetLoss

                self.terms[name] = SegUNetLoss(paras, seg_unet_params)
            else:
                raise ValueError(f"unsupported loss term: {name}")

    # -- state machine (reference basic_loss.py:89) -------------------------

    def set_training_state(self, state: str):
        assert state in self.loss_scalars, f"unknown training state {state}"
        self.current_state = state

    def active_terms(self, state: Optional[str] = None):
        state = state or self.current_state
        return {n: s for n, s in self.loss_scalars[state].items() if n in self.terms}

    # -- jit-friendly composite ---------------------------------------------

    def __call__(self, pred, batch, state: Optional[str] = None,
                 adv_state=None):
        """Weighted sum over the current state's terms. Traceable.

        ``adv_state`` (discriminator params/stats) must be supplied when
        the state has GAN terms — it rides into the batch the same way
        the trainer's jitted step provides it, so this entry point and
        the training loop share one code path."""
        state = state or self.current_state
        if adv_state is not None:
            batch = dict(batch, _adv_state=adv_state)
        total = jnp.float32(0.0)
        report = {}
        for name, scalar in self.loss_scalars[state].items():
            term = self.terms[name]
            value = term(pred, batch["out"], batch)
            total = total + scalar * value
            report[name] = value
        return total, report

    # -- host-side records / printing (basic_loss.py:29-60) -----------------

    def record(self, report: Dict[str, float], state: Optional[str] = None):
        state = state or self.current_state
        rec = self.records.setdefault(state, {})
        for name, value in report.items():
            rec.setdefault(name, []).append(float(value))

    def print_records(self) -> str:
        rows = []
        names = sorted({n for recs in self.records.values() for n in recs})
        for state in self.training_states:
            recs = self.records.get(state, {})
            row = [state]
            for n in names:
                vs = recs.get(n)
                row.append("{:.4}".format(float(np.mean(vs))) if vs else "-")
            rows.append(row)
        return tabulate(rows, headers=["state"] + names)

    def state_dict(self) -> dict:
        return {"records": self.records, "current_state": self.current_state}

    def load_state_dict(self, d: dict):
        self.records = d.get("records", self.records)
        self.current_state = d.get("current_state", self.current_state)
