"""InceptionV3 pool3 feature extractor for FID (flax port).

The reference uses the pytorch-fid InceptionV3 port
(/root/reference/metrics/fid_inception.py) with the FID-specific weights
``pt_inception-2015-12-05-6726825d.pth`` (stripped from the mirror).
This is the same architecture in flax (NHWC): torchvision inception_v3
up to the final average pool (2048-d features), with pytorch-fid's
FID-variant pooling inside InceptionA/C/E kept (they only change
branch_pool counting, which the weights absorb — structure identical
for import).

``load_fid_inception_params(path)`` maps a pytorch-fid checkpoint into
this tree; without weights the module still runs (random init) but FID
values are not comparable to published numbers (the FID class warns).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBNRelu(nn.Module):
    """torchvision BasicConv2d: conv (no bias) + BN(eps=1e-3) + relu."""

    features: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Sequence = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel),
                    (self.stride, self.stride),
                    padding=tuple((p, p) if isinstance(p, int) else p
                                  for p in self.padding),
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return jax.nn.relu(x)


def _avg_pool_3_1_1(x, count_include_pad: bool):
    """3x3 stride-1 pad-1 average pool; pytorch-fid uses
    count_include_pad=False inside its FID blocks."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[1:3])[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBNRelu(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBNRelu(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBNRelu(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = ConvBNRelu(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBNRelu(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = ConvBNRelu(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3_1_1(x, count_include_pad=False)
        bp = ConvBNRelu(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBNRelu(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = ConvBNRelu(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBNRelu(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = ConvBNRelu(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBNRelu(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBNRelu(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBNRelu(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBNRelu(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBNRelu(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBNRelu(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBNRelu(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBNRelu(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBNRelu(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3_1_1(x, count_include_pad=False)
        bp = ConvBNRelu(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBNRelu(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBNRelu(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = ConvBNRelu(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBNRelu(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBNRelu(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBNRelu(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # pytorch-fid: first E uses avg(no pad), second max

    @nn.compact
    def __call__(self, x):
        b1 = ConvBNRelu(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBNRelu(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBNRelu(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = ConvBNRelu(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBNRelu(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBNRelu(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = ConvBNRelu(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = ConvBNRelu(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_3_1_1(x, count_include_pad=False)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = ConvBNRelu(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Features up to the 2048-d global average pool (FID block 3)."""

    @nn.compact
    def __call__(self, x):
        # x: NHWC in [0,1], any spatial size; resized to 299 by the caller
        x = 2.0 * x - 1.0  # pytorch-fid normalize_input
        x = ConvBNRelu(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = ConvBNRelu(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBNRelu(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBNRelu(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBNRelu(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # (N, 2048)


def load_fid_inception_params(path: str):
    """pytorch-fid checkpoint -> flax variables for InceptionV3Pool3."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params: dict = {}
    stats: dict = {}

    def put(tree, keys, value):
        for k in keys[:-1]:
            tree = tree.setdefault(k, {})
        tree[keys[-1]] = value

    for key, v in sd.items():
        if key.startswith(("fc.", "AuxLogits.")):
            continue
        parts = key.split(".")
        v = v.numpy()
        # torch path: Block.conv.weight / Block.bn.{weight,bias,running_*}
        mod_path = parts[:-2]
        layer, leaf = parts[-2], parts[-1]
        if layer == "conv" and leaf == "weight":
            put(params, mod_path + ["conv", "kernel"], v.transpose(2, 3, 1, 0))
        elif layer == "bn":
            if leaf == "weight":
                put(params, mod_path + ["bn", "scale"], v)
            elif leaf == "bias":
                put(params, mod_path + ["bn", "bias"], v)
            elif leaf == "running_mean":
                put(stats, mod_path + ["bn", "mean"], v)
            elif leaf == "running_var":
                put(stats, mod_path + ["bn", "var"], v)
    return {"params": params, "batch_stats": stats}


class InceptionFeatures:
    """Callable feature extractor for the FID class (batched, jitted)."""

    def __init__(self, weights_path: str, block_idx: int = 3, batch_size: int = 16):
        import jax

        self.model = InceptionV3Pool3()
        self.variables = load_fid_inception_params(weights_path)
        self.batch_size = batch_size

        @jax.jit
        def run(x):
            return self.model.apply(self.variables, x)

        self._run = run

    def __call__(self, imgs) -> np.ndarray:
        feats = []
        batch = []
        for img in imgs:
            img = np.asarray(img, dtype=np.float32)
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            batch.append(img)
            if len(batch) == self.batch_size:
                feats.append(self._flush(batch))
                batch = []
        if batch:
            feats.append(self._flush(batch))
        return np.concatenate(feats)

    def _flush(self, batch):
        import jax.numpy as jnp

        from rdst_tpu.data.ops_jax import resize_nhwc

        if all(b.shape == batch[0].shape for b in batch):
            x = jnp.asarray(np.stack(batch))
            if batch[0].shape[:2] != (299, 299):
                x = resize_nhwc(x, (299, 299), "linear")
        else:  # mixed sizes: resize each to the inception input alone
            x = jnp.asarray(np.stack([_to_inception_size(b) for b in batch]))
        return np.asarray(self._run(x))


def _to_inception_size(img: np.ndarray) -> np.ndarray:
    from rdst_tpu.data.ops_jax import resize_nhwc

    if img.shape[:2] == (299, 299):
        return img
    return np.asarray(resize_nhwc(img[None], (299, 299), "linear")[0])
