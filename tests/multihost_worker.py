"""Subprocess worker for the multi-host integration test.

Runs ONE data-parallel train step of a tiny masked-ViT task over all global
devices and prints the resulting loss as JSON. Launched by
tests/test_multihost.py either as a single process (baseline) or as two
jax.distributed processes on localhost (each contributing its per-process
shard of the same global batch via parallel/multihost.py helpers).

Must be a real script (spawn-safe __main__ guard); see
.claude/skills/verify/SKILL.md for why heredocs can't drive multiprocess jax.
"""

import json
import os
import sys


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    import numpy as np

    from pero_pretraining_tpu.parallel.multihost import (
        initialize_distributed,
        make_global_batch,
        process_local_batch_slice,
    )

    initialized = initialize_distributed()

    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, MeshConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.parallel.mesh import create_mesh
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.training.trainer import Trainer

    n_devices = jax.device_count()  # GLOBAL device count after initialization
    total_batch = 8

    config = TrainingConfig(learning_rate=1e-3, warmup_iterations=0, masking_prob=0.3, seed=0)
    task = MaskedTask(
        BackboneConfig(type="vit", model_dim=64, num_heads=2, num_blocks=2, feedforward_dim=128, max_len=512),
        HeadConfig(in_features=64, out_features=50),
        config,
    )
    mesh = create_mesh(MeshConfig(data=n_devices, model=1))
    trainer = Trainer(task, config, mesh=mesh)

    # the same global batch on every process (seeded host RNG); each process
    # contributes only its own slice, as a real per-host loader would
    batch = synthetic_masked_batch(np.random.RandomState(0), batch_size=total_batch, width=256, num_labels=50)
    local = {k: v[process_local_batch_slice(total_batch)] for k, v in batch.items()}
    global_batch = make_global_batch(local, mesh)

    state = trainer.init_state(batch)
    state, metrics = trainer._train_step(state, global_batch)
    loss = float(metrics["loss"])

    if jax.process_index() == 0:
        print(
            json.dumps(
                {
                    "loss": loss,
                    "initialized": initialized,
                    "process_count": jax.process_count(),
                    "global_devices": n_devices,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
