"""Native segmentation-UNet trainer.

The reference ships pre-trained ``loss/unet_*.pt`` blobs (stripped from
the mirror) for the UNet-F perceptual loss. This trainer produces the
equivalent natively: a SegUNet (smp-compatible topology) trained on a
dataset's HR slices + labels with cross-entropy + Dice, saved as a
pickle of flax variables that ``SegUNetLoss`` loads via the
``unet_native_ckpt`` config key.

Usage:
    python -m rdst_tpu.runners.train_seg_unet \
        --config-file config_files/rdst_e1_oasis_x4.ini \
        --steps 2000 --out weights/unet_oasis_native.pkl
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def train_seg_unet(paras, steps: int = 1000, lr: float = 1e-3, batch_size: int = 8,
                   patch: int = 96, seed: int = 0, log_every: int = 100,
                   verbose: bool = True):
    import jax
    import jax.numpy as jnp
    import optax

    from rdst_tpu.data.readers import OASISSegSRTrain
    from rdst_tpu.losses.seg_unet import dice_loss
    from rdst_tpu.models.seg_unet import SegUNet

    paras.set("batch_size", batch_size)
    paras.set("patch_size", patch // int(paras.sr_scale))
    ds = OASISSegSRTrain(paras)
    n_classes = int(max(np.max(lab) for lab in ds.segmentation_labels)) + 1
    channels = ds.hr_images[0].shape[-1]

    model = SegUNet(in_channels=channels, classes=n_classes)
    rng = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((1, patch, patch, channels))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rng, x0)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, labels):
        def loss_fn(p):
            (feats, dec, logits), updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32)).mean()
            d = dice_loss(logits, labels, list(range(n_classes)))
            return ce + d, (updates["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return params, new_stats, opt_state, loss, acc

    np_rng = np.random.default_rng(seed)
    losses = []
    for step in range(steps):
        batch = ds.sample(np_rng)
        x = jnp.asarray(batch["out"])  # HR patches
        labels = jnp.asarray(batch["seg_gt"][..., 0])
        params, batch_stats, opt_state, loss, acc = train_step(
            params, batch_stats, opt_state, x, labels)
        if (step + 1) % log_every == 0:
            l, a = float(loss), float(acc)
            losses.append(l)
            if verbose:
                print(f"[seg-unet] step {step + 1}/{steps} loss={l:.4f} acc={a:.4f}",
                      flush=True)

    return {"params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats)}, losses


def main():
    ap = argparse.ArgumentParser(description="Train the seg-loss UNet natively")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", default="weights/unet_oasis_native.pkl")
    args = ap.parse_args()

    from rdst_tpu.config import ParametersLoader

    paras = ParametersLoader(args.config_file)
    variables, _ = train_seg_unet(paras, args.steps, args.lr, args.batch_size)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(variables, f)
    print(f"saved seg-UNet to {args.out} "
          f"(set unet_native_ckpt = '{args.out}' in the config)")


if __name__ == "__main__":
    main()
