"""Segmentation-UNet perceptual loss (the 'UNet-F' term).

Functional re-design of the reference SegUNet_F
(/root/reference/loss/seg_unet.py:12-127): a frozen UNet scores SR
outputs in four modes, selected by the single key of
``unet_loss_layers``:

* 'encoder-L1'/['encoder-L2'] -> feature-match selected encoder stages
  (note the reference swaps the names: 'L1' uses MSE, 'L2' uses MAE —
  kept for parity, seg_unet.py:71-78);
* 'decoder'   -> match the decoder output;
* 'label-hr'  -> Dice of SR logits vs argmax(UNet(HR));
* 'label-gt'  -> Dice of SR logits vs the dataset's GT labels.

Weights: loaded from a reference ``unet_*.pt`` when available
(RDST_TPU_UNET_PT env var or config ``unet_pt_path``), else from a
natively-trained/random-initialized flax UNet. Random frozen features
still act as a structured perceptual prior; the native trainer in
``rdst_tpu/runners/train_seg_unet.py`` produces a real one from labels.
"""

from __future__ import annotations

import os
import warnings
from typing import Sequence

import jax
import jax.numpy as jnp

from rdst_tpu.models.seg_unet import SegUNet, init_seg_unet

_MODE_CONFIG = {
    "OASIS": dict(in_channels=1, classes=4),
    "BraTS": dict(in_channels=4, classes=4),
    "ACDC": dict(in_channels=1, classes=4),
    "COVID": dict(in_channels=1, classes=4),
}


def dice_loss(logits: jax.Array, labels: jax.Array, classes: Sequence[int]) -> jax.Array:
    """Multiclass Dice loss (smp.losses.DiceLoss semantics): softmax
    probabilities, per-class dice over (batch, spatial), mean over the
    selected classes."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes)
    dims = (0, 1, 2)
    inter = jnp.sum(probs * onehot, axis=dims)
    card = jnp.sum(probs + onehot, axis=dims)
    dice = (2.0 * inter + 1e-7) / (card + 1e-7)
    sel = jnp.asarray(list(classes))
    return 1.0 - jnp.mean(dice[sel])


class SegUNetLoss:
    """Callable term(pred, target, batch) for the SRLoss registry."""

    def __init__(self, paras, variables=None):
        mode = paras.unet_loss_mode
        base = next((k for k in _MODE_CONFIG if k in mode), "OASIS")
        cfg = _MODE_CONFIG[base]
        self.dice_classes = [1, 2, 3] if ("tumor_only" in mode or "lesion_only" in mode) else [0, 1, 2, 3]

        loss_layers = paras.unet_loss_layers
        self.loss_mode = list(loss_layers.keys())[-1]
        self.loss_layers = loss_layers[self.loss_mode]

        self.model = SegUNet(**cfg)
        self.variables = variables
        if self.variables is None:
            self.variables = self._load_or_init(paras, cfg)

        # reference quirk kept for parity: 'L1' -> MSE, 'L2' -> MAE
        if "L1" in self.loss_mode:
            self.feat_loss = lambda a, b: jnp.mean((a - b) ** 2)
        elif "L2" in self.loss_mode:
            self.feat_loss = lambda a, b: jnp.mean(jnp.abs(a - b))
        else:
            self.feat_loss = lambda a, b: jnp.mean(jnp.abs(a - b))

    def _load_or_init(self, paras, cfg):
        path = paras.get("unet_pt_path") or os.environ.get("RDST_TPU_UNET_PT")
        native = paras.get("unet_native_ckpt")
        if native and os.path.exists(native):
            import pickle

            with open(native, "rb") as f:
                return pickle.load(f)
        if path and os.path.exists(path):
            # torch smp-UNet import is NOT implemented (the reference's
            # unet_oasis.pt blob is stripped upstream, so the mapping is
            # unverifiable) — be loud instead of silently ignoring the
            # user's weights file
            warnings.warn(
                f"SegUNetLoss: unet_pt_path={path!r} is set, but importing "
                "torch smp-UNet checkpoints is not supported; train a native "
                "substitute with `python -m rdst_tpu.runners.train_seg_unet` "
                "and point unet_native_ckpt at it.")
        warnings.warn(
            "SegUNetLoss: no pre-trained UNet weights found; using a frozen "
            "random-initialized UNet (structured perceptual prior). Train one "
            "natively with `python -m rdst_tpu.runners.train_seg_unet`."
        )
        _, variables = init_seg_unet(cfg["in_channels"], cfg["classes"])
        return variables

    def _unet(self, x):
        feats, dec, logits = self.model.apply(self.variables, x, train=False)
        return feats, dec, logits

    def __call__(self, pred, target, batch=None):
        if "encoder" in self.loss_mode:
            sr_feats, _, _ = self._unet(pred)
            hr_feats, _, _ = self._unet(jax.lax.stop_gradient(target))
            loss = jnp.float32(0.0)
            for l in self.loss_layers:
                loss = loss + self.feat_loss(sr_feats[l], jax.lax.stop_gradient(hr_feats[l]))
                loss = loss / len(self.loss_layers)  # parity: reference divides inside the loop
            return loss
        if "decoder" in self.loss_mode:
            _, sr_dec, _ = self._unet(pred)
            _, hr_dec, _ = self._unet(jax.lax.stop_gradient(target))
            return self.feat_loss(sr_dec, jax.lax.stop_gradient(hr_dec))
        if self.loss_mode == "label-hr":
            _, _, sr_logits = self._unet(pred)
            _, _, hr_logits = self._unet(jax.lax.stop_gradient(target))
            hr_label = jnp.argmax(jax.lax.stop_gradient(hr_logits), axis=-1)
            return dice_loss(sr_logits, hr_label, self.dice_classes)
        if self.loss_mode == "label-gt":
            assert batch is not None and "seg_gt" in batch, "label-gt needs seg_gt in batch"
            _, _, sr_logits = self._unet(pred)
            gt = batch["seg_gt"]
            if gt.ndim == 4:
                gt = gt[..., 0]
            return dice_loss(sr_logits, gt, self.dice_classes)
        raise ValueError(f"Invalid UNet Seg Loss Mode: {self.loss_mode}")
