"""AOT export of trained generators to self-contained serving bundles.

Framework extension (no reference counterpart — the reference's only
deployment artifact is a torch ``.pt`` checkpoint that needs the full
research codebase to run; basic_tester.py:117-129). A bundle is a
directory:

.. code-block:: text

    bundle/
      MANIFEST.json        model identity, scales, dtype, platforms,
                           normalization, entry table
      params.msgpack       flax-serialized parameter tree
      sr_x4.0_56x56.shlo   jax.export StableHLO per (scale, LR shape),
                           symbolic batch dim  [+ .portable.shlo twin]

TPU-first choices:

* the batch dimension is exported symbolically so one artifact serves
  any batch size; the loader pads to power-of-two buckets so XLA
  compiles each bucket once (static shapes on the MXU);
* when the config ships Pallas kernel gates (``pallas_kernels``), the
  primary entry embeds the fused Mosaic kernels (TPU-only custom
  calls) and a portable XLA-only twin is written alongside — the
  loader picks by the backend it finds at serve time;
* normalization (MeanShift) is baked into the exported graph, so a
  bundle needs neither the training volumes nor the ``.ini`` config.
"""

from __future__ import annotations

import json
import os
from os.path import join
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

MANIFEST_NAME = "MANIFEST.json"
_FORMAT = 1


def _canon_input(x) -> np.ndarray:
    """Accept (H,W) / (N,H,W) / (N,H,W,C); return f32 NHWC."""
    x = np.asarray(x, np.float32)
    if x.ndim == 2:
        x = x[None, :, :, None]
    elif x.ndim == 3:
        x = x[..., None]
    if x.ndim != 4:
        raise ValueError(f"expected (H,W)/(N,H,W)/(N,H,W,C), got {x.shape}")
    return x


# Default serving bucket ladder. Every bucket is one XLA executable
# compiled lazily (or at --warmup): the r4 serving bench measured the
# full power-of-two ladder 1..64 at 222 s of compiles per process
# (SERVING_BENCH.json bucket_warmup_s), a 4-minute readiness gap. A
# sparse {1, 8, 64} ladder cuts that ~2.3x for a bounded padding cost
# (worst case 7/8 wasted rows on a 2-slice request — device time at
# bucket 8 is still <10 ms at the flagship rate). 'pow2' restores the
# dense ladder; RDST_TPU_SERVE_BUCKETS or the server's --buckets flag
# override. RDST_TPU_CACHE=1 (real TPU runtimes; NOT the axon dev
# tunnel — see rdst_tpu/__init__.py) removes restart compiles entirely.
DEFAULT_BUCKETS = "1,8,64"


def resolve_buckets(max_batch: int, spec=None) -> Tuple[int, ...]:
    """Resolve a bucket-ladder spec into a sorted tuple capped at
    ``max_batch`` (which is always included as the top bucket so
    oversized requests chunk at full batch). ``spec``: comma list
    ('1,8,64'), 'pow2' for the dense ladder, or None for the
    RDST_TPU_SERVE_BUCKETS env / DEFAULT_BUCKETS."""
    max_batch = max(1, int(max_batch))
    spec = spec or os.environ.get("RDST_TPU_SERVE_BUCKETS") or DEFAULT_BUCKETS
    if str(spec).strip().lower() == "pow2":
        out, b = set(), 1
        while b < max_batch:
            out.add(b)
            b *= 2
        out.add(max_batch)
        return tuple(sorted(out))
    vals = {int(v) for v in str(spec).split(",") if str(v).strip()}
    vals = {v for v in vals if 1 <= v <= max_batch}
    vals.add(max_batch)
    return tuple(sorted(vals))


def _bucket(n: int, buckets: Tuple[int, ...]) -> int:
    """Smallest ladder bucket >= n, else the top bucket (oversized
    requests split into top-bucket chunks)."""
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


def _bucketed_predict(fn, params, x: np.ndarray, buckets: Tuple[int, ...],
                      residual_scale: float, put=jnp.asarray,
                      min_bucket: int = 1) -> np.ndarray:
    """Shared dispatch: pad to bucket, run, slice, blend residual.

    ``put`` moves a host chunk to the device(s) — mesh-aware callers
    pass a batch-sharding device_put; ``min_bucket`` keeps every bucket
    divisible by the mesh's data axis."""
    n = x.shape[0]
    b = max(_bucket(n, buckets), min_bucket)
    out_chunks = []
    for i in range(0, n, b):
        blk = x[i:i + b]
        pad = b - blk.shape[0]
        if pad:
            blk = np.concatenate([blk, np.repeat(blk[-1:], pad, 0)])
        y = np.asarray(fn(params, put(blk)))
        out_chunks.append(y[:b - pad] if pad else y)
    out = np.concatenate(out_chunks, 0)
    if residual_scale > 0:
        # MetaSR eval-time bicubic blend (meta_sr_trainer.py:171-172)
        from rdst_tpu.data import ops

        res = np.stack([
            np.asarray(ops.resize(xi, out.shape[1:3])).reshape(out.shape[1:])
            for xi in x])
        out = out * (1.0 - residual_scale) + res * residual_scale
    return out


def build_serving_model(paras):
    """Build the generator + trained params exactly like the tester.

    Returns ``(model, params, infer_dtype, meta)`` where ``meta`` is the
    manifest-identity dict (generator name, scales, normalization...).
    """
    from rdst_tpu.checkpoint.loading import (load_well_trained_params,
                                             resolve_model_path,
                                             resolve_norm_stats,
                                             resolve_pallas_softmax)
    from rdst_tpu.kernels.window_attention import export_kernel_flags
    from rdst_tpu.models import build_generator

    export_kernel_flags(paras)
    resolve_pallas_softmax(resolve_model_path(paras))
    idt = str(paras.get("inference_dtype", "float32")).lower()
    infer_dtype = (jnp.bfloat16 if idt in ("bfloat16", "bf16")
                   else jnp.float32)
    path = resolve_model_path(paras)
    if not path:
        raise ValueError("no well-trained model path configured "
                         "(well_trained_single_scale_model_g)")
    mean = std = None
    norm = paras.normal_inputs or ""
    if "zero_mean" in norm or "unit_std" in norm:
        mean, std = resolve_norm_stats(paras, path)
    model = build_generator(paras, mean, std, dtype=infer_dtype)
    scales = [float(s) for s in paras.get("sr_scales_for_final_testing",
                                          paras.test_sr_scales)]
    params = load_well_trained_params(model, paras, path, scales)
    # the EFFECTIVE kernel mode, i.e. what a trace on this host will
    # actually contain: pallas_mode() defaults to 'rdstb' with the env
    # UNSET (so reading the raw env here mislabeled the default as
    # kernels-off — on a TPU host export then tried to lower Mosaic
    # custom calls for the 'cpu' platform and died), and the nn/swin
    # gates additionally require a TPU backend (or interpret mode)
    from rdst_tpu.kernels.window_attention import (pallas_interpret,
                                                   pallas_mode)

    effective_kernels = (pallas_mode()
                         if (jax.default_backend() == "tpu"
                             or pallas_interpret()) else "")
    meta = {
        "format": _FORMAT,
        "model_name": paras.model_name,
        "feature_generator": str(paras.get("feature_generator")),
        "input_channel": int(paras.input_channel),
        "dtype": "bfloat16" if infer_dtype == jnp.bfloat16 else "float32",
        "layout": "NHWC",
        "scales": scales,
        "scale_free": bool(paras.scale_free),
        "residual_scale": float(paras.get("residual_scale", 0.0) or 0.0),
        "pallas_kernels": effective_kernels or None,
        # resolved variant ('auto' never reaches here — resolved above)
        "pallas_softmax": os.environ.get("RDST_TPU_PALLAS_SOFTMAX") or None,
        "jax_version": jax.__version__,
    }
    return model, params, infer_dtype, meta


def _export_entry(model, params, infer_dtype, scale: float,
                  lr_hw: Tuple[int, int], channels: int,
                  platforms: Sequence[str]) -> bytes:
    """Serialize one (scale, LR shape) forward with symbolic batch."""

    def fn(p, x):
        out = model.apply(p, x.astype(infer_dtype), scale)
        return out.astype(jnp.float32)

    (b,) = jexport.symbolic_shape("b")
    xspec = jax.ShapeDtypeStruct((b, lr_hw[0], lr_hw[1], channels),
                                 jnp.float32)
    pspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params)
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(pspec, xspec)
    return exp.serialize()


def export_bundle(paras, out_dir: str,
                  lr_shapes: Sequence[Tuple[int, int]],
                  scales: Optional[Sequence[float]] = None) -> str:
    """Export a trained config to a serving bundle directory.

    ``lr_shapes``: the LR (H, W) points to compile (production slices
    are fixed-shape; arbitrary sizes go through the server's tiling or
    a new export). One StableHLO entry is written per (scale, shape).
    """
    model, params, infer_dtype, meta = build_serving_model(paras)
    scales = [float(s) for s in (scales or meta["scales"])]
    os.makedirs(out_dir, exist_ok=True)

    from flax import serialization

    with open(join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))

    kernels_on = bool(meta["pallas_kernels"]) and \
        str(meta["pallas_kernels"]).lower() not in ("0", "off", "none", "xla")
    specs = [(s, tuple(hw)) for s in scales for hw in lr_shapes]

    def stem(s, hw):
        return f"sr_x{s:g}_{hw[0]}x{hw[1]}"

    def write_all(suffix, platforms):
        for s, hw in specs:
            data = _export_entry(model, params, infer_dtype, s, hw,
                                 meta["input_channel"], platforms)
            with open(join(out_dir, stem(s, hw) + suffix), "wb") as f:
                f.write(data)

    if kernels_on:
        # fused Mosaic custom calls are TPU-only; portable XLA-only
        # twins ride alongside for CPU smoke/fallback. All primary
        # entries export first, then ONE env flip for all the twins
        # (the kernel mode gate is read per trace)
        write_all(".shlo", ["tpu"])
        # kernels off for the portable twin: the env must be an EXPLICIT
        # "0" — popping it would fall back to the 'rdstb' default
        saved = os.environ.get("RDST_TPU_PALLAS")
        os.environ["RDST_TPU_PALLAS"] = "0"
        from rdst_tpu.kernels import clear_kernel_caches

        clear_kernel_caches()
        try:
            write_all(".portable.shlo", ["cpu", "tpu"])
        finally:
            if saved is None:
                os.environ.pop("RDST_TPU_PALLAS", None)
            else:
                os.environ["RDST_TPU_PALLAS"] = saved
            clear_kernel_caches()
        entries = [{"scale": s, "lr_hw": list(hw),
                    "file": stem(s, hw) + ".shlo", "platforms": ["tpu"],
                    "portable_file": stem(s, hw) + ".portable.shlo",
                    "portable_platforms": ["cpu", "tpu"]}
                   for s, hw in specs]
    else:
        write_all(".shlo", ["cpu", "tpu"])
        entries = [{"scale": s, "lr_hw": list(hw),
                    "file": stem(s, hw) + ".shlo",
                    "platforms": ["cpu", "tpu"]} for s, hw in specs]
    meta["entries"] = entries
    with open(join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir




class ServingBundle:
    """Load an exported bundle and run padded, bucketed inference.

    ``predict(x, scale)`` accepts (H,W) / (N,H,W) / (N,H,W,C) float
    arrays whose spatial shape matches an exported entry, pads the
    batch to a power-of-two bucket (static shapes — one XLA executable
    per bucket), and returns f32 HR of shape (N, H*s, W*s, C).
    """

    def __init__(self, bundle_dir: str, max_batch: int = 64, buckets=None):
        self.dir = bundle_dir
        self.max_batch = int(max_batch)
        self.buckets = resolve_buckets(max_batch, buckets)
        with open(join(bundle_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        from flax import serialization

        with open(join(bundle_dir, "params.msgpack"), "rb") as f:
            raw = f.read()
        tree = serialization.msgpack_restore(raw)
        self.params = jax.tree.map(jnp.asarray, tree)
        self._exported: Dict[str, object] = {}
        self._calls: Dict[str, object] = {}
        self.backend = jax.default_backend()

    @classmethod
    def load(cls, bundle_dir: str, **kw) -> "ServingBundle":
        return cls(bundle_dir, **kw)

    def _entry_for(self, scale: float, hw: Tuple[int, int]) -> dict:
        for e in self.manifest["entries"]:
            if abs(e["scale"] - scale) < 1e-6 and tuple(e["lr_hw"]) == hw:
                return e
        raise ValueError(
            f"bundle has no entry for scale {scale} @ LR {hw}; available: "
            f"{[(e['scale'], tuple(e['lr_hw'])) for e in self.manifest['entries']]}")

    def _call_for(self, entry: dict):
        fname = entry["file"]
        if self.backend not in entry["platforms"]:
            portable = entry.get("portable_file")
            if portable and self.backend in entry.get(
                    "portable_platforms", ["cpu", "tpu"]):
                fname = portable
            else:
                raise ValueError(
                    f"bundle entry {entry['file']} was exported for "
                    f"platforms {entry['platforms']} (portable twin: "
                    f"{entry.get('portable_platforms')}); current jax "
                    f"backend is {self.backend!r} — re-export the bundle "
                    "for this platform")
        if fname not in self._calls:
            with open(join(self.dir, fname), "rb") as f:
                exp = jexport.deserialize(f.read())
            # jit the exported call so per-bucket executables are cached
            self._calls[fname] = jax.jit(exp.call)
        return self._calls[fname]

    def predict(self, x, scale: float) -> np.ndarray:
        x = _canon_input(x)
        entry = self._entry_for(float(scale), x.shape[1:3])
        fn = self._call_for(entry)
        rs = float(self.manifest.get("residual_scale", 0.0) or 0.0)
        return _bucketed_predict(fn, self.params, x, self.buckets, rs)


class LiveModel:
    """Bundle-compatible ``predict`` over a live (non-exported) model.

    Used by the server's ``--config-file`` mode: builds the generator +
    params from a training config (same path as the tester) and jits
    per (scale, bucket shape). Mesh-aware like the tester: the config's
    ``mesh_shape`` key shards each batch over the data axis (params
    replicated; buckets padded to a mesh multiple), so one server
    process drives a whole slice of chips. Prefer
    :class:`ServingBundle` for single-chip deployment — it needs no
    config, data tree, or model code version.
    """

    def __init__(self, paras, max_batch: int = 64, buckets=None):
        from rdst_tpu.parallel import (batch_sharding,
                                       make_mesh_from_paras,
                                       replicate_tree)

        # make_mesh_from_paras also registers the active mesh so the
        # Pallas kernel wrappers shard_map over it (must precede the
        # first trace)
        self.mesh = make_mesh_from_paras(paras)
        model, params, infer_dtype, meta = build_serving_model(paras)
        self.model = model
        self.params = replicate_tree(self.mesh, params)
        self.manifest = dict(meta, entries=[],
                             mesh={k: int(v)
                                   for k, v in self.mesh.shape.items()})
        self.max_batch = int(max_batch)
        self.buckets = resolve_buckets(max_batch, buckets)
        self._dtype = infer_dtype
        self._fns: Dict[Tuple, object] = {}
        self._batch_sharding = batch_sharding(self.mesh)

    def _put(self, blk: np.ndarray):
        return jax.device_put(blk, self._batch_sharding)

    def predict(self, x, scale: float) -> np.ndarray:
        x = _canon_input(x)
        scale = float(scale)
        key = (scale,)
        if key not in self._fns:
            model, dtype = self.model, self._dtype

            def fn(p, xb, _s=scale):
                return model.apply(p, xb.astype(dtype), _s).astype(
                    jnp.float32)

            self._fns[key] = jax.jit(fn)
        rs = float(self.manifest.get("residual_scale", 0.0) or 0.0)
        return _bucketed_predict(self._fns[key], self.params, x,
                                 self.buckets, rs, put=self._put,
                                 min_bucket=self.mesh.shape["data"])


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a trained config to a serving bundle")
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--out", required=True, help="bundle directory")
    ap.add_argument("--lr-hw", type=int, nargs=2, action="append",
                    required=True, metavar=("H", "W"),
                    help="LR shape(s) to compile (repeatable)")
    ap.add_argument("--scales", type=float, nargs="*", default=None)
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. 'cpu' to export "
                    "host-side; the JAX_PLATFORMS env var is ignored "
                    "when a TPU plugin is installed)")
    ap.add_argument("set", nargs="*", help="key=value config overrides")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from rdst_tpu.config import ParametersLoader

    paras = ParametersLoader(args.config_file)
    for kv in args.set:
        k, _, v = kv.partition("=")
        paras.set(k.strip(), eval(v))  # noqa: S307 — same eval'd-INI
        # semantics as the reference's config overrides (parameter_loader)
    out = export_bundle(paras, args.out,
                        [tuple(hw) for hw in args.lr_hw], args.scales)
    with open(join(out, MANIFEST_NAME)) as f:
        print(f.read())


if __name__ == "__main__":
    main()
