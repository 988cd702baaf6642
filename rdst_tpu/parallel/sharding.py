"""Parameter/activation sharding rules over the device mesh.

Growth path beyond pure data parallelism (SURVEY §2.11): GSPMD-style
tensor parallelism. Rather than hand-writing collectives, parameters get
NamedSharding constraints and XLA partitions every matmul/conv and
inserts the all-reduces over ICI:

* Dense/conv kernels: shard the OUTPUT feature dim on the 'model' axis
  when divisible (qkv/mlp fc1 split by heads — Megatron style);
* biases/scales follow their kernel's output dim;
* everything else replicated.

Sequence parallelism falls out of batch sharding for window models: the
window grid is embarrassingly parallel except at shifted-window halos,
which GSPMD materializes as collective-permutes when activations are
sharded spatially (activation constraint helpers below).
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_spec(path, value, mesh: Mesh, axis: str = "model") -> P:
    """PartitionSpec for one parameter under tensor parallelism."""
    n = mesh.shape[axis]
    if n == 1 or not hasattr(value, "ndim"):
        return P()
    name = "/".join(str(p) for p in path).lower()
    if "relative_position_bias_table" in name or "embed" in name:
        return P()
    if value.ndim >= 1 and value.shape[-1] % n == 0 and value.shape[-1] >= 2 * n:
        # output-feature split: kernels (in, out) / (h, w, in, out), biases (out,)
        return P(*([None] * (value.ndim - 1) + [axis]))
    return P()


def shard_params_tp(mesh: Mesh, params, axis: str = "model"):
    """device_put the parameter tree with TP output-dim sharding."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [
        jax.device_put(v, NamedSharding(mesh, tp_param_spec(path, v, mesh, axis)))
        for path, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def with_spatial_sharding(x: jax.Array, mesh: Mesh, axis: str = "model"):
    """Constrain an NHWC activation to be sharded over H (sequence/window
    parallelism); XLA inserts halo exchanges at shifted windows."""
    if mesh.shape[axis] == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis, None, None)))
