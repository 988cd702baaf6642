"""Device mesh and sharding helpers.

The reference is single-GPU (SURVEY §2.11: no distributed code at all);
this layer is the TPU-native replacement designed in from day one:

* a 1-D ``('data',)`` mesh over all local devices is the default —
  batch-in-dataset batches shard along it, params are replicated, and
  XLA/GSPMD inserts the gradient all-reduce over ICI;
* model/sequence axes can be added later without rewrites: helpers take
  an axis-spec, not hard-coded names;
* on one chip everything degrades to no-op shardings (same jitted code).

Multi-host: `initialize_distributed()` wires jax.distributed when the
env says we're in a pod; harmless locally.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Initialize jax.distributed if launched in a multi-host job.

    Must run BEFORE the backends exist: probing jax.process_count()
    (or running any computation) first would initialize the local-only
    backend and make distributed.initialize() raise — so the guard is
    env-only and double-initialization is tolerated instead.
    """
    if not os.environ.get("COORDINATOR_ADDRESS"):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:  # idempotent for callers that re-enter
        if "already" not in str(e).lower():
            raise


def make_mesh(axes: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Mesh over all (or given) devices; default single 'data' axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    devices = devices.reshape(shape)
    return Mesh(devices, tuple(axes))


_DEFAULT_AXES = ("data", "model", "seq")


def make_mesh_from_paras(paras) -> Mesh:
    """Config-driven mesh (SURVEY §2.11 first-class requirement).

    Config keys (both optional, production entry points all route here):
      mesh_shape = [2, 2, 2]        ; device grid; one -1 wildcard allowed
      mesh_axes  = ['data', 'model', 'seq']  ; names, default by position

    Default (no keys): a 1-D ('data',) mesh over all local devices —
    identical to the pre-config behavior. Axis meanings: 'data' shards
    batches (DP), 'model' shards parameter output-features (TP),
    'seq' shards activation rows (SP / halo-exchanged window grid).
    """
    shape = paras.get("mesh_shape") if hasattr(paras, "get") else None
    axes = paras.get("mesh_axes") if hasattr(paras, "get") else None
    if shape is None:
        mesh = make_mesh(tuple(axes) if axes else ("data",))
        set_active_mesh(mesh)
        return mesh
    shape = [int(s) for s in shape]
    if axes is None:
        if len(shape) > len(_DEFAULT_AXES):
            raise ValueError(
                f"mesh_shape has {len(shape)} dims; name them explicitly "
                f"via mesh_axes (defaults cover {_DEFAULT_AXES})")
        axes = _DEFAULT_AXES[: len(shape)]
    axes = tuple(str(a) for a in axes)
    if len(axes) != len(shape):
        raise ValueError(f"mesh_axes {axes} and mesh_shape {shape} disagree")
    devices = jax.devices()
    if shape.count(-1) > 1:
        raise ValueError(f"mesh_shape {shape} has more than one -1 wildcard")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if known <= 0 or len(devices) % known:
            raise ValueError(
                f"mesh_shape {shape}: cannot infer -1 from {len(devices)} devices")
        shape[shape.index(-1)] = len(devices) // known
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(
            f"mesh_shape {shape} needs {need} devices, only "
            f"{len(devices)} visible")
    mesh = make_mesh(axes, shape, devices[:need])
    set_active_mesh(mesh)
    return mesh


_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Register the process's production mesh for trace-time consumers.

    GSPMD cannot partition a ``pallas_call`` (an opaque custom call):
    with batch-sharded inputs it all-gathers the batch and every device
    redundantly computes ALL of it — silent loss of data parallelism.
    The kernel wrappers (kernels/swin_block.py etc.) therefore query
    this registry and run their grids under ``jax.shard_map`` over the
    data axis, keeping each device's shard local. Returns the previous
    value so tests can restore it.
    """
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    return prev


def active_data_mesh(axis: str = "data"):
    """``(mesh, axis)`` when a mesh with a >1-sized data axis is
    registered, else ``(None, None)``. Single-device (or axis-less)
    meshes return None: shard_map would only add tracing overhead."""
    m = _ACTIVE_MESH
    if m is not None and axis in m.shape and m.shape[axis] > 1:
        return m, axis
    return None, None


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_REPLICATION_WARNED = False


def shard_batch(mesh: Mesh, batch, axis: str = "data", spatial: Optional[str] = None):
    """device_put a host batch with batch-dim sharding.

    Leaves whose leading dim does not divide the mesh axis are
    REPLICATED (scalars and per-batch metadata rely on this; a
    legitimately indivisible batch — e.g. lr_image_size_remain forces
    batch_size 1 — still computes correctly, just without data
    parallelism). The first such replicated array-leaf emits a one-time
    warning so a misconfigured batch size doesn't silently burn the
    whole mesh on redundant work.

    ``spatial`` names a mesh axis to additionally shard the H dim of
    NHWC image leaves over (sequence parallelism): GSPMD then keeps the
    window grid row-split across devices and inserts halo exchanges at
    shifted-window/conv boundaries.
    """
    n = mesh.shape[axis]
    sharding = batch_sharding(mesh, axis)
    sp = spatial if spatial in mesh.shape and mesh.shape[spatial] > 1 else None

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
            if sp and x.ndim == 4 and x.shape[1] % mesh.shape[sp] == 0:
                return jax.device_put(x, NamedSharding(mesh, P(axis, sp)))
            return jax.device_put(x, sharding)
        if hasattr(x, "ndim") and x.ndim >= 2 and n > 1:
            global _REPLICATION_WARNED
            if not _REPLICATION_WARNED:
                _REPLICATION_WARNED = True
                import warnings

                warnings.warn(
                    f"shard_batch: leading dim {x.shape[0]} does not "
                    f"divide the {n}-device '{axis}' axis; replicating "
                    "(every device computes the full batch)")
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def shard_batch_padded(mesh: Mesh, x, axis: str = "data"):
    """Pad the leading dim up to a mesh-axis multiple (repeating the last
    element) and shard it. Returns (device_array, original_size) — the
    inference paths slice the padding back off after the fetch."""
    x = np.asarray(x)
    n = mesh.shape[axis]
    b = x.shape[0]
    pad = (-b) % n
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
    return jax.device_put(x, batch_sharding(mesh, axis)), b
