"""GAN discriminators: CNN (wgan.py:5-59) and Swin-transformer
(trans_wgan.py:8-242).

* CNN: 8 BasicBlocks (conv+BN+act, stride-2 every other) + 2-layer MLP;
  BN disabled for *_GP variants.
* Swin: conv head + RSTB4GAN blocks (BasicLayer + conv residual +
  conv/patchmerging downsampling) + MLP; inputs replicate-padded to the
  configured resolution.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.models.rdst import to_image, to_tokens
from rdst_tpu.nn.common import Conv
from rdst_tpu.nn.layers import LayerNorm, activation, trunc_normal_init
from rdst_tpu.nn.swin import BasicLayer, PatchMerging


class BasicBlock(nn.Module):
    """conv + optional BN + act (networks/common.py:12-23)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    bn: bool = True
    act: Optional[str] = "leaky_relu"
    act_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    (self.stride, self.stride), padding=self.kernel_size // 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.act:
            x = activation(self.act, self.act_slope)(x)
        return x


class CNNDiscriminator(nn.Module):
    in_chans: int = 1
    base_features: int = 64
    depth: int = 7
    patch_size: int = 96  # HR patch size (lr_patch * scale)
    bn: bool = True
    act: str = "leaky_relu"
    act_slope: float = 0.2  # paras.leaky_relu_slope (reference wgan.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_channels = self.base_features
        x = BasicBlock(out_channels, 3, bn=self.bn, act=self.act,
                       act_slope=self.act_slope,
                       dtype=self.dtype, name="features_0")(x, train)
        for i in range(self.depth):
            if i % 2 == 1:
                stride = 1
                out_channels *= 2
            else:
                stride = 2
            x = BasicBlock(out_channels, 3, stride=stride, bn=self.bn, act=self.act,
                           act_slope=self.act_slope,
                           dtype=self.dtype, name=f"features_{i + 1}")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1024, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="classifier_0")(x)
        x = activation(self.act, self.act_slope)(x)
        return nn.Dense(1, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="classifier_1")(x)


class RSTB4GAN(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    downsample: str = "conv"  # 'conv' | 'patchmerging' | ''
    bn: bool = False
    act: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_size, train: bool = False):
        tokens, _ = to_tokens(x)
        y = BasicLayer(dim=self.dim, depth=self.depth, num_heads=self.num_heads,
                       window_size=self.window_size, mlp_ratio=4.0,
                       dtype=self.dtype, name="residual_group")(tokens, x_size)
        y = Conv(self.dim, 3, dtype=self.dtype, name="conv")(to_image(y, x_size))
        tokens = to_tokens(y)[0] + tokens

        if self.downsample == "conv":
            img = to_image(tokens, x_size)
            return BasicBlock(self.dim * 2, 3, stride=2, bn=self.bn, act=self.act,
                              dtype=self.dtype, name="downsample_layer")(img, train)
        if self.downsample == "patchmerging":
            # nn/swin.PatchMerging: identical math/param tree to the
            # reference's GAN merge (trans_wgan.py:207-242)
            merged = PatchMerging(self.dim, dtype=self.dtype,
                                  name="downsample_layer")(tokens, x_size)
            return to_image(merged, (x_size[0] // 2, x_size[1] // 2))
        return to_image(tokens, x_size)


class STDiscriminator(nn.Module):
    in_chans: int = 1
    basic_dim: int = 64
    input_resolution: Tuple[int, int] = (96, 96)
    num_heads: Sequence[int] = (4, 4, 4)
    depth: Sequence[int] = (2, 2, 2)
    window_size: Sequence[int] = (8, 8, 8)
    downsample: str = "conv"
    bn: bool = True
    act: str = "leaky_relu"
    act_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # replicate-pad (or crop — the reference's negative F.pad) to the
        # fixed build resolution (trans_wgan.py:192-200)
        x = x[:, : self.input_resolution[0], : self.input_resolution[1], :]
        h, w = x.shape[1:3]
        ph = self.input_resolution[0] - h
        pw = self.input_resolution[1] - w
        if ph > 0 or pw > 0:
            x = jnp.pad(x, ((0, 0), (0, max(ph, 0)), (0, max(pw, 0)), (0, 0)),
                        mode="edge")

        x = BasicBlock(self.basic_dim, 3, bn=self.bn, act=self.act,
                       act_slope=self.act_slope,
                       dtype=self.dtype, name="head")(x, train)
        dim = self.basic_dim
        x_size = tuple(self.input_resolution)
        for i, (nh, d, ws) in enumerate(zip(self.num_heads, self.depth, self.window_size)):
            x = RSTB4GAN(dim=dim, depth=d, num_heads=nh, window_size=ws,
                         downsample=self.downsample, dtype=self.dtype,
                         name=f"blocks_{i}")(x, x_size, train)
            dim *= 2
            x_size = (x_size[0] // 2, x_size[1] // 2)

        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1024, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="classifier_0")(x)
        x = activation(self.act, self.act_slope)(x)
        return nn.Dense(1, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="classifier_1")(x)


def build_discriminator(paras, dtype=jnp.float32):
    gan_type = paras.gan_type
    bn = "GP" not in gan_type
    if "ST" in gan_type or "st" in gan_type.replace("Scale", ""):
        return STDiscriminator(
            in_chans=paras.input_channel,
            basic_dim=paras.get("stgan_dim", 64),
            input_resolution=tuple(paras.get(
                "stgan_input_resolution",
                (int(paras.patch_size * paras.sr_scale),) * 2)),
            num_heads=tuple(paras.get("stgan_num_heads", (4, 4, 4))),
            depth=tuple(paras.get("stgan_depth", (2, 2, 2))),
            window_size=tuple(paras.get("stgan_window_size", (8, 8, 8))),
            downsample=paras.get("stgan_downsample", "conv"),
            bn=bn, act=paras.get("d_act", "leaky_relu"),
            act_slope=float(paras.get("leaky_relu_slope", 0.2) or 0.2),
            dtype=dtype)
    return CNNDiscriminator(
        in_chans=paras.input_channel,
        base_features=paras.get("gan_d_base_features", 64),
        depth=paras.get("gan_d_depth", 7),
        patch_size=int(paras.patch_size * paras.sr_scale),
        bn=bn, act=paras.get("d_act", "leaky_relu"),
        act_slope=float(paras.get("leaky_relu_slope", 0.2) or 0.2),
        dtype=dtype)
