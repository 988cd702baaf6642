"""Shared well-trained-checkpoint loading (tester + serving).

The reference loads trained generators in two places with the same
semantics (torch.load in basic_tester.py:117-129 and the trainers'
``pre_trained_g`` warm start, trans_sr_trainer.py:246-283). Here the
equivalent logic — msgpack snapshot restore against a multi-scale
template, torch ``.pt`` import bridge, and normalization-stats
resolution — is one module reused by ``runners/tester.py`` and
``rdst_tpu/serving``.
"""

from __future__ import annotations

import os
from os.path import exists
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def resolve_model_path(paras) -> Optional[str]:
    """Well-trained weights path with the reference's key precedence:
    explicit single-scale first, then the family keys MetaSRTester read
    (meta_sr_tester.py:48,60), then the per-scale x4 fallback. ONE
    implementation shared by the tester and the serving layer (an r4
    review found the two had diverged: MetaSR configs loaded in test.py
    but not in serve/export)."""
    return (paras.get("well_trained_single_scale_model_g")
            or paras.get("well_trained_model_metasr")
            or paras.get("well_trained_model_mdsr")
            or paras.get("well_trained_model_g_x4"))


def read_stats_sidecar(model_path: Optional[str]) -> Optional[dict]:
    """The ``<snapshot>.stats.json`` sidecar the trainer writes next to
    every msgpack: normalization stats plus (since r5) the audited
    ``attn_logit_max`` stamp. None when absent."""
    if not model_path:
        return None
    import json

    sidecar = os.path.splitext(model_path)[0] + ".stats.json"
    if not exists(sidecar):
        return None
    with open(sidecar) as f:
        return json.load(f)


def resolve_norm_stats(paras, model_path: Optional[str]) -> Tuple[float, float]:
    """Training-set mean/std for zero_mean/unit_std configs.

    Prefer the stats sidecar (the snapshot is then self-contained, like
    the reference's in-checkpoint MeanShift, networks/common.py:151-167);
    fall back to recomputing from the training volumes only when no
    sidecar exists (old snapshots).
    """
    stats = read_stats_sidecar(model_path)
    if stats is not None and "mean" in stats:
        return stats["mean"], stats["std"]
    from rdst_tpu.data.readers import make_train_valid_datasets

    ds_train, _ = make_train_valid_datasets(paras)
    return ds_train.mean, ds_train.std


def resolve_pallas_softmax(model_path: Optional[str]) -> str:
    """Resolve ``pallas_softmax='auto'`` against the checkpoint's
    audited logit bound, BEFORE the first trace (trace-time env gate).

    Call after ``export_kernel_flags`` once the weight path is known
    (tester, serving export, bench). No-op unless the env says 'auto'.
    Policy lives in kernels.swin_block.resolve_softmax_auto: clamp only
    when ``attn_logit_max`` is stamped and clears the safety margin;
    unstamped checkpoints get the exact stable softmax.
    """
    mode = os.environ.get("RDST_TPU_PALLAS_SOFTMAX", "")
    if mode != "auto":
        return mode
    from rdst_tpu.kernels.swin_block import resolve_softmax_auto

    stats = read_stats_sidecar(model_path) or {}
    resolved = resolve_softmax_auto(stats.get("attn_logit_max"))
    os.environ["RDST_TPU_PALLAS_SOFTMAX"] = resolved
    return resolved


def init_param_template(model, paras, sr_scales: Sequence[float]):
    """Abstract-init a parameter tree covering every per-scale branch.

    The template must declare every lazily-created per-scale branch
    (MDSR heads/tails, IPT queries) or ``from_bytes`` fails on the key
    mismatch — mirrors the trainer's multi-scale init.
    """
    x0 = jnp.zeros((1, 16, 16, paras.input_channel))
    all_scales = sorted(
        {float(s) for s in sr_scales}
        | {float(s) for s in (paras.get("all_sr_scales") or [])})
    if paras.scale_free:
        smax = float(max(all_scales))
        return jax.jit(lambda r, x: model.init(r, x, smax))(
            jax.random.PRNGKey(0), x0)

    def init_method(mdl, x):
        out = None
        for s in all_scales:
            out = mdl(x, s)
        return out

    return jax.jit(lambda r, x: model.init(r, x, method=init_method))(
        jax.random.PRNGKey(0), x0)


def load_well_trained_params(model, paras, path: str,
                             sr_scales: Sequence[float]):
    """Load a trained generator's params from msgpack or torch formats.

    Native ``.msgpack`` snapshots restore against a multi-scale template
    (:func:`init_param_template`); reference ``.pt``/``.pth``/``.tar``
    checkpoints route through the torch import bridge
    (checkpoint/torch_import.py). A ``.pt`` path whose ``.msgpack``
    sibling exists silently prefers the native snapshot, so reference
    configs pointing at torch filenames keep working after a retrain.
    """
    stem, ext = os.path.splitext(path)
    if ext == ".pt" and not exists(path) and exists(stem + ".msgpack"):
        path, ext = stem + ".msgpack", ".msgpack"
    if ext == ".msgpack":
        from flax import serialization

        template = init_param_template(model, paras, sr_scales)
        with open(path, "rb") as f:
            data = f.read()
        try:
            return serialization.from_bytes(jax.device_get(template), data)
        except (ValueError, KeyError) as e:
            # per-scale-param families (MDSR heads/tails, IPT queries)
            # fail here when a TESTING scale was never trained — name
            # the actual problem instead of the raw key mismatch
            raise ValueError(
                f"snapshot {path} does not match the expected parameter "
                f"tree for testing scales {list(sr_scales)} (training "
                f"scales {paras.get('all_sr_scales')}): most likely "
                "the model was never trained at one of the testing "
                "scales, so its per-scale branch is absent from the "
                f"snapshot. Underlying error: {e}") from e
    if ext in (".pt", ".tar", ".pth"):
        from rdst_tpu.checkpoint.torch_import import load_torch_checkpoint

        arch = paras.feature_generator
        kwargs = {}
        if arch == "swinir":
            kwargs["upsampler"] = paras.sir_upsampler
        return load_torch_checkpoint(path, arch, **kwargs)
    raise ValueError(f"unknown checkpoint format: {path}")
