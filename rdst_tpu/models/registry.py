"""Model factory registry.

`feature_generator` config values map to factories, mirroring the
reference trainer dispatch (/root/reference/models/trans_sr_trainer.py:39-57
plus the sota/meta/ipt trainer families). Every factory takes
``(paras, mean, std, dtype)`` and returns a flax Module whose
``__call__(x, sr_scale=None, deterministic=True)`` maps NHWC LR -> HR.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

MODEL_REGISTRY: Dict[str, Callable] = {}

BUILTIN_GENERATORS = (
    "rdst", "estsr", "swinir", "edsr", "rdn", "rcan", "han",
    "convnet-large", "convnet-lite", "srresnet", "srdensenet", "esrgan",
    "mdsr", "metasr", "ipt", "dbpn", "zssr", "swinmlp", "swin-mlp",
    "wtb", "wtr", "wtp", "wts",
)

# the reference trainers match generator names case-sensitively in
# several spellings ('EDSR', 'SwinIR', 'swin', 'Rcan', ...); names are
# canonicalized to lowercase here, with the odd alias mapped explicitly
_ALIASES = {"swin": "swinir"}


def register(name: str):
    # canonicalize like build_generator's lookup does, so a custom model
    # registered as e.g. 'MyNet' stays reachable from the config
    def deco(fn):
        MODEL_REGISTRY[str(name).strip().lower()] = fn
        return fn

    return deco


def build_generator(paras, mean=None, std=None, dtype=jnp.float32):
    # 'feature_generator' is the main key; the reference's sota trainer
    # reads 'sr_generator' instead (sota_sr_trainer.py:29-34) — accept both
    raw = paras.get("feature_generator") or paras.get("sr_generator")
    name = str(raw).strip().lower()
    name = _ALIASES.get(name, name)
    if name == "bicubic":
        raise ValueError(
            "'bicubic' is the tester's pass-through mode (no generator "
            "network to build) — run test.py with it instead")
    # lazy imports keep optional model families decoupled
    if name not in MODEL_REGISTRY:
        _load_builtin(name)
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown feature_generator {raw!r}. "
            f"Available: {sorted(set(BUILTIN_GENERATORS) | set(MODEL_REGISTRY))}"
        )
    return MODEL_REGISTRY[name](paras, mean, std, dtype)


def _load_builtin(name: str) -> None:
    if name == "rdst":
        from rdst_tpu.models.rdst import make_rdst

        MODEL_REGISTRY["rdst"] = make_rdst
    elif name == "estsr":
        from rdst_tpu.models.estsr import make_estsr

        MODEL_REGISTRY[name] = make_estsr
    elif name == "swinir":
        from rdst_tpu.models.swinir import make_swinir

        MODEL_REGISTRY["swinir"] = make_swinir
    elif name == "edsr":
        from rdst_tpu.models.edsr import make_edsr

        MODEL_REGISTRY["edsr"] = make_edsr
    elif name == "rdn":
        from rdst_tpu.models.rdn import make_rdn

        MODEL_REGISTRY["rdn"] = make_rdn
    elif name == "rcan":
        from rdst_tpu.models.rcan import make_rcan

        MODEL_REGISTRY["rcan"] = make_rcan
    elif name == "han":
        from rdst_tpu.models.han import make_han

        MODEL_REGISTRY["han"] = make_han
    elif name in ("convnet-large", "convnet-lite"):
        from rdst_tpu.models.convnext_sr import make_convnet_large, make_convnet_lite

        MODEL_REGISTRY["convnet-large"] = make_convnet_large
        MODEL_REGISTRY["convnet-lite"] = make_convnet_lite
    elif name == "srresnet":
        from rdst_tpu.models.srresnet import make_srresnet

        MODEL_REGISTRY[name] = make_srresnet
    elif name == "srdensenet":
        from rdst_tpu.models.srdensenet import make_srdensenet

        MODEL_REGISTRY[name] = make_srdensenet
    elif name == "esrgan":
        from rdst_tpu.models.esrgan import make_esrgan

        MODEL_REGISTRY[name] = make_esrgan
    elif name == "mdsr":
        from rdst_tpu.models.mdsr import make_mdsr

        MODEL_REGISTRY[name] = make_mdsr
    elif name == "metasr":
        from rdst_tpu.models.metasr import make_metasr

        MODEL_REGISTRY[name] = make_metasr
    elif name == "ipt":
        from rdst_tpu.models.ipt import make_ipt

        MODEL_REGISTRY["ipt"] = make_ipt
    elif name == "dbpn":
        from rdst_tpu.models.dbpn import make_dbpn

        MODEL_REGISTRY[name] = make_dbpn
    elif name == "zssr":
        from rdst_tpu.models.zssr import make_zssr

        MODEL_REGISTRY[name] = make_zssr
    elif name in ("swinmlp", "swin-mlp"):
        from rdst_tpu.models.swin_mlp import make_swinmlp

        MODEL_REGISTRY[name] = make_swinmlp
    elif name in ("wtb", "wtr", "wtp", "wts"):
        from rdst_tpu.models.wavelet_sr import make_wavelet_sr

        MODEL_REGISTRY[name] = make_wavelet_sr
