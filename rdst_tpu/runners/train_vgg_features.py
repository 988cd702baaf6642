"""Native VGG-feature substitute trainer.

The reference's VGG22/VGG54/Minc_VGG* perceptual losses load
torchvision/materials VGG19 weights (/root/reference/loss/vgg.py:34-38,
loss/minc_vgg19_nets.py) — blobs stripped from the mirror and not
downloadable here. This trainer produces a learned substitute the same
way weights/unet_tiny.pkl did for UNet-F: a width-scaled VGG19 feature
stack (same topology/taps as torchvision ``vgg19.features``) trained as
a denoising autoencoder on a dataset's HR slices, so the perceptual
loss compares structured learned features instead of a random init.

Usage:
    python -m rdst_tpu.runners.train_vgg_features \
        --config-file config_files/rdst_e1_oasis_x4.ini \
        --steps 2000 --width 0.25 --out weights/vgg19_features_native.pkl
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def train_vgg_features(paras, steps: int = 2000, width: float = 0.25,
                       lr: float = 2e-4, batch_size: int = 16,
                       patch: int = 64, noise: float = 0.1, seed: int = 0,
                       log_every: int = 200, verbose: bool = True):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from rdst_tpu.data.readers import make_train_valid_datasets
    from rdst_tpu.losses.vgg import _TAPS, VGG19Features
    from rdst_tpu.nn.layers import torch_conv_init

    ds_train, _ = make_train_valid_datasets(paras)
    slices = [np.asarray(s, np.float32) for s in ds_train.hr_images]

    class DAE(nn.Module):
        """encoder (the deliverable) + light conv decoder (discarded)."""

        @nn.compact
        def __call__(self, x):
            f = VGG19Features(tap=_TAPS["54"], width=width,
                              name="encoder")(x)
            y = f
            for i, ch in enumerate((128, 64, 32, 16)):
                b, h, w, _ = y.shape
                y = jax.image.resize(y, (b, h * 2, w * 2, y.shape[-1]),
                                     "nearest")
                y = nn.Conv(max(8, int(ch * width * 4)), (3, 3), padding=1,
                            kernel_init=torch_conv_init,
                            name=f"dec_{i}")(y)
                y = jax.nn.relu(y)
            return nn.Conv(x.shape[-1], (3, 3), padding=1,
                           kernel_init=torch_conv_init, name="dec_out")(y)

    model = DAE()
    rng = np.random.default_rng(seed)
    x0 = jnp.zeros((1, patch, patch, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), x0)
    tx = optax.adam(lr)
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, noisy, clean):
        def loss_fn(v):
            rec = model.apply(v, noisy)
            return jnp.mean((rec - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state, loss

    def sample_batch():
        xs = []
        for _ in range(batch_size):
            s = slices[rng.integers(len(slices))]
            h, w = s.shape[:2]
            i = rng.integers(max(h - patch, 0) + 1)
            j = rng.integers(max(w - patch, 0) + 1)
            crop = s[i:i + patch, j:j + patch]
            if crop.shape[:2] != (patch, patch):
                crop = np.pad(crop, ((0, patch - crop.shape[0]),
                                     (0, patch - crop.shape[1]), (0, 0)))
            xs.append(np.repeat(crop[..., :1], 3, axis=-1))
        clean = np.stack(xs)
        noisy = clean + noise * rng.standard_normal(clean.shape,
                                                    dtype=np.float32)
        return jnp.asarray(noisy), jnp.asarray(clean)

    losses = []
    for step in range(1, steps + 1):
        noisy, clean = sample_batch()
        variables, opt_state, loss = train_step(variables, opt_state,
                                                noisy, clean)
        if step % log_every == 0 or step == steps:
            losses.append(float(loss))
            if verbose:
                print(f"[vgg-dae] step {step}/{steps} mse={losses[-1]:.5f}")

    enc_params = {k: jax.device_get(v)
                  for k, v in variables["params"]["encoder"].items()}
    return {"width": width, "params": enc_params, "losses": losses}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--out", default="weights/vgg19_features_native.pkl")
    args = ap.parse_args()

    from rdst_tpu.config import ParametersLoader

    paras = ParametersLoader(args.config_file)
    blob = train_vgg_features(paras, steps=args.steps, width=args.width,
                              batch_size=args.batch_size, patch=args.patch)
    with open(args.out, "wb") as f:
        pickle.dump(blob, f)
    print(f"saved {args.out} (width={blob['width']}, "
          f"final mse={blob['losses'][-1]:.5f})")


if __name__ == "__main__":
    main()
