"""Flax params -> torch state_dict bridge (the inverse of torch_import).

Lets models trained in rdst_tpu be loaded by the reference PyTorch
framework (RDSTSR / SwinIR layouts). MeanShift convs are reconstructed
from the (mean, std) config values (they are frozen closed-form layers,
networks/common.py:151-167); rel-pos index / attn-mask buffers are left
to the torch module's own registration (load with strict=False).
"""

from __future__ import annotations

import re
from typing import Dict, Sequence

import numpy as np


def _conv_w(v):  # HWIO -> OIHW
    return np.ascontiguousarray(np.asarray(v).transpose(3, 2, 0, 1))


def _linear_w(v):  # (in, out) -> (out, in)
    return np.ascontiguousarray(np.asarray(v).T)


def _mean_shift_entries(mean: Sequence[float], std: Sequence[float]) -> Dict[str, np.ndarray]:
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    nc = len(mean)
    eye = np.eye(nc, dtype=np.float32).reshape(nc, nc, 1, 1)
    return {
        "sub_mean.weight": eye / std.reshape(nc, 1, 1, 1),
        "sub_mean.bias": -mean / std,
        "add_mean.weight": eye * std.reshape(nc, 1, 1, 1),
        "add_mean.bias": mean.copy(),
    }


def _swin_leaf(flax_path: str, value):
    """Translate the inner Swin-block part of a flax path."""
    p = flax_path
    p = re.sub(r"blocks_(\d+)", r"blocks.\1", p)
    p = p.replace("/attn/qkv/kernel", ".attn.qkv.weight")
    p = p.replace("/attn/qkv/bias", ".attn.qkv.bias")
    p = p.replace("/attn/proj/kernel", ".attn.proj.weight")
    p = p.replace("/attn/proj/bias", ".attn.proj.bias")
    p = p.replace("/attn/relative_position_bias_table",
                  ".attn.relative_position_bias_table")
    p = p.replace("/mlp/fc1/kernel", ".mlp.fc1.weight")
    p = p.replace("/mlp/fc1/bias", ".mlp.fc1.bias")
    p = p.replace("/mlp/fc2/kernel", ".mlp.fc2.weight")
    p = p.replace("/mlp/fc2/bias", ".mlp.fc2.bias")
    p = p.replace("/norm1/scale", ".norm1.weight")
    p = p.replace("/norm1/bias", ".norm1.bias")
    p = p.replace("/norm2/scale", ".norm2.weight")
    p = p.replace("/norm2/bias", ".norm2.bias")
    p = p.replace("/", ".")
    if p.endswith(".weight") and np.asarray(value).ndim == 2:
        value = _linear_w(value)
    return p, np.asarray(value)


def export_rdstsr(params, mean=(0.0,), std=(1.0,)) -> Dict[str, np.ndarray]:
    """Flax RDSTSR params -> reference RDSTSR state_dict (numpy values)."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params["params"] if "params" in params else params)
    sd: Dict[str, np.ndarray] = dict(_mean_shift_entries(mean, std))
    for path, v in flat.items():
        p = "/".join(path)
        v = np.asarray(v)
        if p.startswith("head/conv/"):
            sd["head." + p.split("/")[-1].replace("kernel", "weight")] = (
                _conv_w(v) if v.ndim == 4 else v)
        elif p.startswith("patch_embed_norm/"):
            leaf = "weight" if p.endswith("scale") else "bias"
            sd[f"patch_embed.norm.{leaf}"] = v
        elif p == "absolute_pos_embed":
            sd["absolute_pos_embed"] = v
        elif p.startswith("norm/"):
            leaf = "weight" if p.endswith("scale") else "bias"
            sd[f"norm.{leaf}"] = v
        elif p.startswith("conv_after_body"):
            m = re.match(r"conv_after_body(?:_(\d+))?/conv/(kernel|bias)", p)
            idx = f".{m.group(1)}" if m.group(1) else ""
            leaf = "weight" if m.group(2) == "kernel" else "bias"
            sd[f"conv_after_body{idx}.{leaf}"] = _conv_w(v) if v.ndim == 4 else v
        elif p.startswith("tail_up/"):
            m = re.match(r"tail_up/conv_(\d+)/conv/(kernel|bias)", p)
            leaf = "weight" if m.group(2) == "kernel" else "bias"
            sd[f"tail.0.{2 * int(m.group(1))}.{leaf}"] = (
                _conv_w(v) if v.ndim == 4 else v)
        elif p.startswith("tail_conv/"):
            leaf = "weight" if p.endswith("kernel") else "bias"
            sd[f"tail.1.{leaf}"] = _conv_w(v) if v.ndim == 4 else v
        elif p.startswith("body_"):
            # body_{i}/body_{j}/(head|tail)_{k} adapters, /body/blocks_{k},
            # /conv(_k) bottleneck
            q = re.sub(r"^body_(\d+)", r"body.\1", p)
            q = re.sub(r"/body_(\d+)", r"/body.\1", q)
            m = re.search(r"/(head|tail)_(\d+)/(kernel|bias|scale)$", q)
            if m:
                base = q[: m.start()].replace("/", ".")
                leaf = "weight" if m.group(3) in ("kernel", "scale") else "bias"
                val = _linear_w(v) if (m.group(3) == "kernel" and v.ndim == 2) else v
                sd[f"{base}.{m.group(1)}.{m.group(2)}.{leaf}"] = val
                continue
            m = re.search(r"/conv(?:_(\d+))?/conv/(kernel|bias)$", q)
            if m:
                base = q[: m.start()].replace("/", ".")
                idx = f".{m.group(1)}" if m.group(1) else ""
                leaf = "weight" if m.group(2) == "kernel" else "bias"
                sd[f"{base}.conv{idx}.{leaf}"] = _conv_w(v) if v.ndim == 4 else v
                continue
            # swin block innards under .../body/blocks_k/...
            head, _, rest = q.partition("/body/")
            key, val = _swin_leaf("/" + rest, v)
            sd[head.replace("/", ".") + ".body" + key] = val
        else:
            raise KeyError(f"unmapped flax path for export: {p}")
    return sd


def export_swinir(params) -> Dict[str, np.ndarray]:
    """Flax SwinIR params -> reference SwinIR state_dict (numpy values).

    The reference's ``mean`` buffer (img_range mean shift,
    swin_transformer_sr.py:605-868) is registered by the torch module
    itself — load with strict=False like the rel-pos/mask buffers."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params["params"] if "params" in params else params)
    sd: Dict[str, np.ndarray] = {}
    for path, v in flat.items():
        p = "/".join(path)
        v = np.asarray(v)
        m = re.match(
            r"^(conv_first|conv_after_body|conv_last|conv_hr|conv_up1|conv_up2)"
            r"/conv/(kernel|bias)$", p)
        if m:
            leaf = "weight" if m.group(2) == "kernel" else "bias"
            sd[f"{m.group(1)}.{leaf}"] = _conv_w(v) if v.ndim == 4 else v
            continue
        m = re.match(r"^conv_before_upsample/conv/(kernel|bias)$", p)
        if m:
            leaf = "weight" if m.group(1) == "kernel" else "bias"
            sd[f"conv_before_upsample.0.{leaf}"] = (
                _conv_w(v) if v.ndim == 4 else v)
            continue
        if p.startswith("patch_embed_norm/"):
            leaf = "weight" if p.endswith("scale") else "bias"
            sd[f"patch_embed.norm.{leaf}"] = v
            continue
        if p == "absolute_pos_embed":
            sd[p] = v
            continue
        if p.startswith("norm/"):
            leaf = "weight" if p.endswith("scale") else "bias"
            sd[f"norm.{leaf}"] = v
            continue
        m = re.match(r"^upsample_conv/conv/(kernel|bias)$", p)
        if m:  # UpsampleOneStep (pixelshuffledirect)
            leaf = "weight" if m.group(1) == "kernel" else "bias"
            sd[f"upsample.0.{leaf}"] = _conv_w(v) if v.ndim == 4 else v
            continue
        m = re.match(r"^upsample_(\d+)/conv/(kernel|bias)$", p)
        if m:  # classical Upsample chain: convs at even indices
            leaf = "weight" if m.group(2) == "kernel" else "bias"
            sd[f"upsample.{2 * int(m.group(1))}.{leaf}"] = (
                _conv_w(v) if v.ndim == 4 else v)
            continue
        m = re.match(r"^layers_(\d+)/conv(?:_(\d+))?/conv/(kernel|bias)$", p)
        if m:
            idx = f".{m.group(2)}" if m.group(2) else ""
            leaf = "weight" if m.group(3) == "kernel" else "bias"
            sd[f"layers.{m.group(1)}.conv{idx}.{leaf}"] = (
                _conv_w(v) if v.ndim == 4 else v)
            continue
        m = re.match(r"^layers_(\d+)/residual_group/(.+)$", p)
        if m:
            key, val = _swin_leaf("/" + m.group(2), v)
            sd[f"layers.{m.group(1)}.residual_group" + key] = val
            continue
        raise KeyError(f"unmapped flax path for SwinIR export: {p}")
    return sd


def export_from_template(params, arch: str, template, *,
                         mean=(0.0,), std=(1.0,),
                         **mapper_kwargs) -> Dict[str, np.ndarray]:
    """Generic flax -> torch export for ANY family with an import map.

    torch_import's per-family mappers are pure index rearrangements
    (transposes/reshapes/splits), so they invert mechanically: run each
    template key through the mapper with an ``arange`` index array —
    where the indices land in the flax tree says exactly which torch
    element each flax element came from — then scatter the flax values
    back. ``template`` maps torch key -> tensor or shape tuple (e.g. the
    reference model's ``state_dict()`` or any same-architecture ``.pt``
    — the natural artifact to have when pushing weights back to torch).

    Keys the import deliberately skips are reconstructed where
    closed-form (mean-shift convs from mean/std) and otherwise omitted
    (PReLU slopes, rel-pos index / mask buffers) — load with
    ``strict=False``. Raises KeyError for keys the family's map cannot
    place and ValueError when a flax leaf only partially covers a torch
    tensor (a merge the tracer cannot invert).
    """
    from flax.traverse_util import flatten_dict

    from rdst_tpu.checkpoint.torch_import import _MAPPERS

    mapper = _MAPPERS[arch]
    flat = flatten_dict(params["params"] if "params" in params else params)
    flax_vals = {"/".join(str(s) for s in p): np.asarray(v)
                 for p, v in flat.items()}
    shift = _mean_shift_entries(mean, std)
    sd: Dict[str, np.ndarray] = {}
    for key, tv in template.items():
        shape = (tuple(tv) if isinstance(tv, (tuple, list))
                 else tuple(tv.shape))
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        idx = np.arange(n, dtype=np.int64).reshape(shape)
        placed = list(mapper(key, idx, **mapper_kwargs) or ())
        if not placed:  # import skips it: closed-form or torch-side buffer
            if key in shift:
                sd[key] = shift[key]
            continue
        out = np.empty(n, np.float32)
        filled = 0
        for path, tr in placed:
            p = "/".join(str(s) for s in path)
            if p not in flax_vals:
                raise KeyError(f"{arch} export: template key {key!r} maps "
                               f"to {p!r}, absent from the flax tree")
            fv = np.asarray(flax_vals[p], np.float32)
            tr = np.asarray(tr)
            if tr.shape != fv.shape:
                raise ValueError(
                    f"{arch} export: {key!r} -> {p!r} shape mismatch "
                    f"{tr.shape} vs {fv.shape} (partial/merged mapping)")
            out[tr.ravel()] = fv.ravel()
            filled += tr.size
        if filled != n:
            raise ValueError(f"{arch} export: {key!r} only {filled}/{n} "
                             "elements covered by the flax tree")
        sd[key] = out.reshape(shape)
    return sd


def save_torch_checkpoint(params, path: str, arch: str = "rdst",
                          mean=(0.0,), std=(1.0,), template=None,
                          **mapper_kwargs) -> None:
    """Write a torch-loadable state_dict .pt. RDST/SwinIR have direct
    layout writers; every other family exports through
    ``export_from_template`` (pass the torch model's state_dict or a
    key->shape mapping as ``template``)."""
    import torch

    if arch == "rdst":
        sd = export_rdstsr(params, mean, std)
    elif arch == "swinir":
        sd = export_swinir(params)
    elif template is not None:
        sd = export_from_template(params, arch, template, mean=mean,
                                  std=std, **mapper_kwargs)
    else:
        raise NotImplementedError(
            f"export for {arch!r} needs a torch-side template "
            "(state_dict or key->shape map); RDST and SwinIR also have "
            "template-free writers")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                for k, v in sd.items()}, path)
