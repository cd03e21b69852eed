from tpu3dssf.parallel.mesh import (
    create_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
    vit_tp_shardings,
)
from tpu3dssf.parallel.sp import sp_block_apply

__all__ = [
    "create_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
    "vit_tp_shardings",
    "sp_block_apply",
]
