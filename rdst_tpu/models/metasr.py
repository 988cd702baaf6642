"""Meta-SR: pluggable feature extractor + MetaUpSampler
(/root/reference/networks/meta_sr.py:14-83).

The extractor is any backbone exposing feature_maps_only semantics
(EDSR / SRResNet / SRDenseNet / RDN / ESRGAN / MDSR).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rdst_tpu.models.meta_upscale import MetaUpSampler
from rdst_tpu.nn.common import mean_shift


def _make_extractor(paras, mode: str, dtype):
    if mode == "EDSR":
        from rdst_tpu.models.edsr import make_edsr

        return make_edsr(paras, dtype=dtype).clone(feature_maps_only=True)
    if mode == "SRResNet":
        from rdst_tpu.models.srresnet import make_srresnet

        return make_srresnet(paras, dtype=dtype).clone(feature_maps_only=True)
    if mode == "SRDenseNet":
        from rdst_tpu.models.srdensenet import make_srdensenet

        return make_srdensenet(paras, dtype=dtype).clone(feature_maps_only=True)
    if mode == "RDN":
        from rdst_tpu.models.rdn import make_rdn

        return make_rdn(paras, dtype=dtype).clone(feature_maps_only=True)
    if mode == "ESRGAN":
        from rdst_tpu.models.esrgan import make_esrgan

        return make_esrgan(paras, dtype=dtype).clone(feature_maps_only=True)
    if mode == "Meta_MDSR":
        from rdst_tpu.models.mdsr import make_mdsr

        return make_mdsr(paras, dtype=dtype).clone(feature_maps_only=True)
    raise ValueError(
        "LR feature extractor should be one of "
        "[EDSR, SRResNet, SRDenseNet, RDN, ESRGAN, Meta_MDSR]")


class MetaSR(nn.Module):
    extractor: nn.Module
    extractor_mode: str
    in_chans: int = 1
    kernel_size: int = 3
    mean: Sequence[float] = (0.0,)
    std: Sequence[float] = (1.0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sr_scale=2.0, deterministic: bool = True):
        import numpy as np

        if hasattr(sr_scale, "ndim"):
            sr_scale = float(np.asarray(sr_scale).reshape(-1)[0])
        x = mean_shift(x, self.mean, self.std, "sub")
        if self.extractor_mode == "Meta_MDSR":
            feats = self.extractor(x, math.ceil(sr_scale), deterministic=deterministic)
        else:
            feats = self.extractor(x, deterministic=deterministic)
        out = MetaUpSampler(out_c=self.in_chans, kernel_size=self.kernel_size,
                            dtype=self.dtype, name="meta_upsampler")(feats, sr_scale)
        return mean_shift(out, self.mean, self.std, "add")


def make_metasr(paras, mean=None, std=None, dtype=jnp.float32) -> MetaSR:
    c = paras.input_channel
    mode = paras.get("meta_feature_generator", paras.get("feature_generator", "EDSR"))
    if mode in ("metasr", "MetaSR"):
        mode = "EDSR"
    return MetaSR(
        extractor=_make_extractor(paras, mode, dtype),
        extractor_mode=mode,
        in_chans=c,
        kernel_size=paras.get("meta_sr_kernel_size", 3),
        mean=tuple(mean) if mean is not None else (0.0,) * c,
        std=tuple(std) if std is not None else (1.0,) * c,
        dtype=dtype,
    )
