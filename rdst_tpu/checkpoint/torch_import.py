"""Torch state_dict -> flax params bridge.

Translates checkpoints saved by the reference networks (RDSTSR from
swinIR_variations.py:890-1141, SwinIR from swin_transformer_sr.py:605-868)
into this package's flax parameter trees. This is the PSNR-parity
linchpin (SURVEY §7.1.6): published RDST-E1 ``.pt`` files load directly.

Layout transforms:
* Conv2d  OIHW -> HWIO  (transpose 2,3,1,0)
* Linear  (out,in) -> (in,out)
* LayerNorm weight -> 'scale'
* MeanShift convs and relative_position_index buffers are skipped
  (both are closed-form recomputed at trace time).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Mapping, Tuple

import numpy as np

Path = Tuple[str, ...]


def _conv_w(v):
    return np.ascontiguousarray(np.asarray(v).transpose(2, 3, 1, 0))


def _linear_w(v):
    return np.ascontiguousarray(np.asarray(v).T)


def _leaf(kind: str, which: str):
    """(flax leaf name, transform) for a torch (layer kind, weight|bias)."""
    if which == "bias":
        return "bias", np.asarray
    if kind == "conv":
        return "kernel", _conv_w
    if kind == "linear":
        return "kernel", _linear_w
    if kind == "norm":
        return "scale", np.asarray
    raise ValueError(kind)


def _map_swin_block(rest: str, value) -> Iterable[Tuple[Path, np.ndarray]]:
    """Map one SwinTransformerBlock's keys (norm1/attn/norm2/mlp)."""
    m = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
    if m:
        leaf, tf = _leaf("norm", m.group(2))
        yield (m.group(1), leaf), tf(value)
        return
    m = re.match(r"attn\.relative_position_bias_table$", rest)
    if m:
        yield ("attn", "relative_position_bias_table"), np.asarray(value)
        return
    if re.match(r"attn\.relative_position_index$", rest) or rest == "attn_mask":
        return  # recomputed buffers
    m = re.match(r"attn\.(qkv|proj)\.(weight|bias)$", rest)
    if m:
        leaf, tf = _leaf("linear", m.group(2))
        yield ("attn", m.group(1), leaf), tf(value)
        return
    m = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", rest)
    if m:
        leaf, tf = _leaf("linear", m.group(2))
        yield ("mlp", m.group(1), leaf), tf(value)
        return
    raise KeyError(f"unmapped swin block key: {rest}")


def _map_basic_layer(rest: str, value) -> Iterable[Tuple[Path, np.ndarray]]:
    m = re.match(r"blocks\.(\d+)\.(.+)$", rest)
    if not m:
        raise KeyError(f"unmapped basic layer key: {rest}")
    for path, v in _map_swin_block(m.group(2), value):
        yield (f"blocks_{m.group(1)}",) + path, v


def _map_conv_block(rest: str, value, flax_name: str = "conv"):
    """'weight'/'bias' (1conv) or '{k}.weight' (3conv Sequential)."""
    m = re.match(r"(weight|bias)$", rest)
    if m:
        leaf, tf = _leaf("conv", m.group(1))
        yield (flax_name, "conv", leaf), tf(value)
        return
    m = re.match(r"(\d+)\.(weight|bias)$", rest)
    if m:
        leaf, tf = _leaf("conv", m.group(2))
        yield (f"{flax_name}_{m.group(1)}", "conv", leaf), tf(value)
        return
    raise KeyError(f"unmapped conv key: {rest}")


def _map_dstl(rest: str, value) -> Iterable[Tuple[Path, np.ndarray]]:
    """DenseSTLayer: head/tail adapters + BasicLayer body."""
    m = re.match(r"(head|tail)\.(\d+)\.(weight|bias)$", rest)
    if m:
        kind = "norm" if np.asarray(value).ndim == 1 and m.group(3) == "weight" else None
        # disambiguate by shape: LayerNorm weight is 1-D, Linear weight 2-D
        v = np.asarray(value)
        if m.group(3) == "weight":
            kind = "norm" if v.ndim == 1 else "linear"
        else:
            # bias: belongs to whichever module sits at this index; both map to 'bias'
            kind = "linear" if v.ndim == 1 else "norm"
        leaf, tf = _leaf(kind if m.group(3) == "weight" else "linear", m.group(3))
        yield (f"{m.group(1)}_{m.group(2)}", leaf), tf(value)
        return
    m = re.match(r"body\.(.+)$", rest)
    if m:
        for path, v in _map_basic_layer(m.group(1), value):
            yield ("body",) + path, v
        return
    raise KeyError(f"unmapped DSTL key: {rest}")


def _map_rdstb(rest: str, value) -> Iterable[Tuple[Path, np.ndarray]]:
    m = re.match(r"body\.(\d+)\.(.+)$", rest)
    if m:
        for path, v in _map_dstl(m.group(2), value):
            yield (f"body_{m.group(1)}",) + path, v
        return
    m = re.match(r"conv\.(.+)$", rest)
    if m:
        yield from _map_conv_block(m.group(1), value)
        return
    if re.match(r"patch_(un)?embed\.", rest):
        return  # no params inside RDSTB embeds
    raise KeyError(f"unmapped RDSTB key: {rest}")


def map_rdstsr_key(key: str, value) -> Iterable[Tuple[Path, np.ndarray]]:  # noqa: C901
    """Translate one RDSTSR torch key to flax (path, value) pairs."""
    if re.match(r"^(sub_mean|add_mean)\.", key):
        return
    m = re.match(r"^head\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("conv", m.group(1))
        yield ("head", "conv", leaf), tf(value)
        return
    m = re.match(r"^patch_embed\.norm\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("norm", m.group(1))
        yield ("patch_embed_norm", leaf), tf(value)
        return
    if re.match(r"^patch_unembed\.", key):
        return
    if key == "absolute_pos_embed":
        yield ("absolute_pos_embed",), np.asarray(value)
        return
    m = re.match(r"^body\.(\d+)\.(.+)$", key)
    if m:
        for path, v in _map_rdstb(m.group(2), value):
            yield (f"body_{m.group(1)}",) + path, v
        return
    m = re.match(r"^norm\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("norm", m.group(1))
        yield ("norm", leaf), tf(value)
        return
    m = re.match(r"^conv_after_body\.(.+)$", key)
    if m:
        yield from _map_conv_block(m.group(1), value, "conv_after_body")
        return
    m = re.match(r"^tail\.0\.(\d+)\.(weight|bias)$", key)
    if m:  # UpSampler Sequential: torch idx 0,2,... are convs (odd = shuffles)
        leaf, tf = _leaf("conv", m.group(2))
        yield ("tail_up", f"conv_{int(m.group(1)) // 2}", "conv", leaf), tf(value)
        return
    m = re.match(r"^tail\.1\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("conv", m.group(1))
        yield ("tail_conv", "conv", leaf), tf(value)
        return
    m = re.match(r"^tail\.(weight|bias)$", key)
    if m:  # sr_scale == 1: tail is a bare conv
        leaf, tf = _leaf("conv", m.group(1))
        yield ("tail_conv", "conv", leaf), tf(value)
        return
    raise KeyError(f"unmapped RDSTSR key: {key}")


def map_swinir_key(key: str, value, upsampler: str = "pixelshuffledirect") -> Iterable[Tuple[Path, np.ndarray]]:
    if key == "mean":
        return
    m = re.match(r"^(conv_first|conv_after_body|conv_last|conv_hr|conv_up1|conv_up2)\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("conv", m.group(2))
        yield (m.group(1), "conv", leaf), tf(value)
        return
    m = re.match(r"^conv_before_upsample\.0\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("conv", m.group(1))
        yield ("conv_before_upsample", "conv", leaf), tf(value)
        return
    m = re.match(r"^patch_embed\.norm\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("norm", m.group(1))
        yield ("patch_embed_norm", leaf), tf(value)
        return
    if key == "absolute_pos_embed":
        yield ("absolute_pos_embed",), np.asarray(value)
        return
    m = re.match(r"^norm\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("norm", m.group(1))
        yield ("norm", leaf), tf(value)
        return
    m = re.match(r"^layers\.(\d+)\.residual_group\.(.+)$", key)
    if m:
        for path, v in _map_basic_layer(m.group(2), value):
            yield (f"layers_{m.group(1)}", "residual_group") + path, v
        return
    m = re.match(r"^layers\.(\d+)\.conv\.(.+)$", key)
    if m:
        for path, v in _map_conv_block(m.group(2), value):
            yield (f"layers_{m.group(1)}",) + path, v
        return
    if re.match(r"^layers\.\d+\.patch_(un)?embed\.", key):
        return
    m = re.match(r"^upsample\.(\d+)\.(weight|bias)$", key)
    if m:
        leaf, tf = _leaf("conv", m.group(2))
        if upsampler == "pixelshuffledirect":  # UpsampleOneStep: idx 0 only
            yield ("upsample_conv", "conv", leaf), tf(value)
        else:  # classical Upsample chain: even indices are convs
            yield (f"upsample_{int(m.group(1)) // 2}", "conv", leaf), tf(value)
        return
    raise KeyError(f"unmapped SwinIR key: {key}")


_MAPPERS = {
    "rdst": map_rdstsr_key,
    "swinir": map_swinir_key,
}


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def convert_state_dict(state_dict: Mapping, arch: str, **mapper_kwargs) -> Dict:
    """Torch state_dict (tensors or ndarrays) -> nested flax params dict.

    ``mapper_kwargs`` disambiguate arch variants (e.g. SwinIR
    ``upsampler='pixelshuffle'`` vs 'pixelshuffledirect').
    """
    from flax.traverse_util import unflatten_dict

    mapper = _MAPPERS[arch]
    sd = state_dict_to_numpy(state_dict)
    flat = {}
    for key, value in sd.items():
        for path, v in mapper(key, value, **mapper_kwargs) or ():
            flat[path] = v
    return {"params": unflatten_dict(flat)}


def load_torch_checkpoint(path: str, arch: str, **mapper_kwargs) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd and all(
        not hasattr(v, "shape") for v in [sd.get("state_dict")]
    ):
        sd = sd["state_dict"]
    return convert_state_dict(sd, arch, **mapper_kwargs)


def verify_params_match(converted, initialized) -> None:
    """Raise if the converted tree misses/extras/mismatches any leaf."""
    from flax.traverse_util import flatten_dict

    a = flatten_dict(converted["params"])
    b = flatten_dict(initialized["params"])
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    if missing or extra:
        raise ValueError(f"param tree mismatch; missing={missing[:5]} extra={extra[:5]} "
                         f"(total {len(missing)}/{len(extra)})")
    for k in b:
        if tuple(a[k].shape) != tuple(b[k].shape):
            raise ValueError(f"shape mismatch at {k}: {a[k].shape} vs {b[k].shape}")
