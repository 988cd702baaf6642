"""Device mesh + sharding layer (the framework's NCCL-equivalent)."""

from rdst_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
    shard_batch_padded,
)
