from pero_pretraining_tpu.parallel.mesh import create_mesh, local_mesh
from pero_pretraining_tpu.parallel.pipeline import stack_block_params, unstack_block_params
from pero_pretraining_tpu.parallel.ring import ring_attention
from pero_pretraining_tpu.parallel.sharding import (
    batch_sharding,
    fsdp_param_shardings,
    param_shardings,
    replicated,
    shard_batch,
    zero1_opt_state_shardings,
)

__all__ = [
    "create_mesh",
    "local_mesh",
    "ring_attention",
    "stack_block_params",
    "unstack_block_params",
    "batch_sharding",
    "fsdp_param_shardings",
    "param_shardings",
    "replicated",
    "shard_batch",
    "zero1_opt_state_shardings",
]
