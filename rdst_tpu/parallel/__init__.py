"""Device mesh + sharding layer (the framework's NCCL-equivalent)."""

from rdst_tpu.parallel.mesh import (  # noqa: F401
    active_data_mesh,
    batch_sharding,
    make_mesh,
    make_mesh_from_paras,
    set_active_mesh,
    replicate_tree,
    replicated,
    shard_batch,
    shard_batch_padded,
)
from rdst_tpu.parallel.sharding import shard_params_tp  # noqa: F401
