from pero_pretraining_tpu.parallel.mesh import create_mesh, local_mesh
from pero_pretraining_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "local_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
]
