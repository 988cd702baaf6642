"""VGG feature losses (VGG22 / VGG54 / Minc_VGG variants).

Reference: /root/reference/loss/vgg.py:14-79 (torchvision VGG19 features
at conv2_2 / conv5_4, ImageNet mean shift, grayscale->3x replication,
per-channel loop for C>3, MSE on features) and
loss/esrgan_vgg/minc_vgg_loss.py (materials-trained VGG19,
pre-activation taps).

Weights: imported from a torchvision-format ``vgg19`` state_dict when a
.pt file is available (``RDST_TPU_VGG19_PT`` env var or
``weights/vgg19.pt``); torchvision itself is not installed here and the
reference's blobs are stripped, so the fallback is a frozen
He-initialized VGG19 — still a useful multi-scale structured prior, and
clearly warned about.
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rdst_tpu.nn.layers import torch_conv_init

# VGG19 feature config: conv channel per layer, 'M' = maxpool
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# torchvision module index of each tap (end-exclusive slice bound)
_TAPS = {"22": 8, "54": 35}


class VGG19Features(nn.Module):
    """VGG19 .features truncated at a tap index (torchvision numbering).

    ``width`` scales every conv's channel count (1.0 = torchvision
    vgg19; the committed native substitute is trained at 0.25 — same
    topology and taps, 16x fewer FLOPs)."""

    tap: int  # number of torchvision feature modules to apply
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        module_idx = 0
        conv_idx = 0
        for item in _VGG19_CFG:
            if item == "M":
                if module_idx >= self.tap:
                    break
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                module_idx += 1
            else:
                if module_idx >= self.tap:
                    break
                x = nn.Conv(max(8, int(item * self.width)), (3, 3),
                            padding=1, dtype=self.dtype,
                            kernel_init=torch_conv_init,
                            name=f"conv_{conv_idx}")(x)
                conv_idx += 1
                module_idx += 1
                if module_idx >= self.tap:
                    break
                x = jax.nn.relu(x)
                module_idx += 1
        return x


def load_vgg19_params(tap: int, path: str | None = None):
    """Torchvision vgg19 state_dict -> flax params for the truncated net."""
    path = path or os.environ.get("RDST_TPU_VGG19_PT", "weights/vgg19.pt")
    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    conv_idx = 0
    module_idx = 0
    for item in _VGG19_CFG:
        if module_idx >= tap:
            break
        if item == "M":
            module_idx += 1
            continue
        w = sd[f"features.{module_idx}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{module_idx}.bias"].numpy()
        params[f"conv_{conv_idx}"] = {"kernel": w, "bias": b}
        conv_idx += 1
        module_idx += 2  # conv + relu
    return {"params": params}


def load_native_features(tap: int, path: str | None = None):
    """Load the natively-trained substitute feature stack (a pickle of
    {'width', 'params'} saved by runners/train_vgg_features.py),
    truncated to the requested tap. Returns (variables|None, width)."""
    import pickle

    path = path or os.environ.get("RDST_TPU_VGG19_NATIVE",
                                  "weights/vgg19_features_native.pkl")
    if not os.path.exists(path):
        return None, 1.0
    with open(path, "rb") as f:
        blob = pickle.load(f)
    # keep only the convs below the tap (module numbering as in loader)
    keep = set()
    conv_idx = module_idx = 0
    for item in _VGG19_CFG:
        if module_idx >= tap:
            break
        if item == "M":
            module_idx += 1
            continue
        keep.add(f"conv_{conv_idx}")
        conv_idx += 1
        module_idx += 2
    params = {k: v for k, v in blob["params"].items() if k in keep}
    if set(params) != keep:  # blob trained for a shallower tap: a partial
        # stack would crash deep inside flax — fall back cleanly instead
        import warnings

        warnings.warn(
            f"native VGG blob at {path} lacks convs "
            f"{sorted(keep - set(params))} for tap {tap}; ignoring it")
        return None, 1.0
    return {"params": params}, float(blob.get("width", 1.0))


class VGGLoss:
    """Callable term(pred, target, batch) for the SRLoss registry."""

    IMAGENET_MEAN = (0.485, 0.456, 0.406)
    IMAGENET_STD = (0.229, 0.224, 0.225)

    def __init__(self, name: str, variables=None):
        conv_index = "54" if "54" in name else "22"
        self.tap = _TAPS[conv_index]
        width = 1.0
        self.variables = variables
        if self.variables is None:
            # Minc_VGG* uses the materials-trained VGG19 (reference
            # loss/esrgan_vgg/minc_vgg_loss.py; blob 'loss/minc_vgg19.pt')
            path = None
            if name.startswith("Minc"):
                path = os.environ.get("RDST_TPU_MINC_VGG19_PT", "weights/minc_vgg19.pt")
            self.variables = load_vgg19_params(self.tap, path)
        if self.variables is None:
            # committed native substitute: a width-scaled VGG19 feature
            # stack trained on the phantom corpus (train_vgg_features.py)
            self.variables, width = load_native_features(self.tap)
        self.model = VGG19Features(tap=self.tap, width=width)
        if self.variables is None:
            warnings.warn(
                f"VGGLoss({name}): no VGG19 weights found; using a frozen "
                "random-initialized VGG (structured multi-scale prior). "
                "Provide weights via RDST_TPU_VGG19_PT for the reference loss.")
            x0 = jnp.zeros((1, 64, 64, 3))
            self.variables = self.model.init(jax.random.PRNGKey(0), x0)

    def _features(self, x):
        mean = jnp.asarray(self.IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(self.IMAGENET_STD, x.dtype)
        return self.model.apply(self.variables, (x - mean) / std)

    def __call__(self, pred, target, batch=None):
        c = pred.shape[-1]
        if c == 1:
            pred = jnp.repeat(pred, 3, axis=-1)
            target = jnp.repeat(target, 3, axis=-1)
            c = 3
        if c == 3:
            f_sr = self._features(pred)
            f_hr = self._features(jax.lax.stop_gradient(target))
            return jnp.mean((f_sr - jax.lax.stop_gradient(f_hr)) ** 2)
        # per-channel replication loop (vgg.py:58-67)
        loss = jnp.float32(0.0)
        for ch in range(c):
            sr_c = jnp.repeat(pred[..., ch : ch + 1], 3, axis=-1)
            hr_c = jnp.repeat(target[..., ch : ch + 1], 3, axis=-1)
            f_sr = self._features(sr_c)
            f_hr = self._features(jax.lax.stop_gradient(hr_c))
            loss = loss + jnp.mean((f_sr - jax.lax.stop_gradient(f_hr)) ** 2)
        return loss
