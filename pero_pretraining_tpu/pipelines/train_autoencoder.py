"""AE / VQ-VAE tokenizer training CLI.

Same surface as the reference (autoencoders/train.py:18-46) with its arg-name
bugs fixed (the reference reads args.trn_path/tst_path that don't exist,
:165-166, and passes datasets where testers expect loaders, :175).
"""

from __future__ import annotations

import argparse

from pero_pretraining_tpu.configs import (
    AutoencoderConfig,
    DataConfig,
    MeshConfig,
    TrainingConfig,
    parse_json_definition,
)
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.autoencoder import AutoencoderTask
from pero_pretraining_tpu.pipelines.cli_common import (
    add_optimizer_arguments,
    build_loaders,
    init_directories,
    make_preempt_handler,
    make_view_step_handler,
    maybe_resume,
    optimizer_config_kwargs,
)
from pero_pretraining_tpu.pipelines.visualizers import AutoencoderVisualizer
from pero_pretraining_tpu.training.tester import Tester, numeric_batch
from pero_pretraining_tpu.training.trainer import Trainer
from pero_pretraining_tpu.utils.logging import MetricsLogger


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--trn-lines-file", "--trn-images-file", dest="trn_lines_file",
                        required=True, help="Training lines file (reference name: --trn-images-file).")
    parser.add_argument("--tst-lines-file", "--tst-images-file", dest="tst_lines_file",
                        required=True, help="Test lines file (reference name: --tst-images-file).")
    parser.add_argument("--lmdb-path", required=True)
    parser.add_argument("--augmentations", default=None)

    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Split each batch into N microbatches scanned inside the step (one optimizer update; activation memory / N).")
    parser.add_argument("--learning-rate", type=float, default=1e-5)
    add_optimizer_arguments(parser)
    parser.add_argument("--start-iteration", type=int, default=0,
                        help="Resume iteration; -1 = auto-resume from the latest checkpoint.")
    parser.add_argument("--end-iteration", type=int, default=100000)
    parser.add_argument("--max-line-width", type=int, default=2048)
    parser.add_argument("--warmup-iterations", type=int, default=0)

    parser.add_argument(
        "--model",
        type=parse_json_definition,
        default="{}",
        help='Model JSON, e.g. {"type": "vqvae", "num_embeddings": 1024, "embeddings_dim": 512}.',
    )

    parser.add_argument("--view-step", type=int, default=500)
    parser.add_argument("--keep-checkpoints", type=int, default=0,
                        help="Retain only the newest N checkpoints (0 = keep all).")
    parser.add_argument("--checkpoints", default=None)
    parser.add_argument("--visualizations", default=None)
    parser.add_argument("--bfloat16", action="store_true")
    parser.add_argument("--denoising", type=float, default=0.0,
                        help="Denoising AE: corrupt inputs on device up to this strength while "
                             "reconstructing the clean image (0 = plain AE, the reference behavior).")
    parser.add_argument("--project-name", default=None, help="ClearML project (optional).")
    parser.add_argument("--task-name", default=None, help="ClearML task (optional).")
    parser.add_argument("--metrics-log", default=None)
    parser.add_argument("--profile-dir", default=None,
                        help="Capture a device trace of a few steady-state steps to this directory.")

    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--mesh-data", type=int, default=-1)
    parser.add_argument("--mesh-model", type=int, default=1)
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="Fuse N optimizer steps per device program (must divide view-step).")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args()


def main():
    args = parse_arguments()
    print(args)

    from pero_pretraining_tpu.pipelines.cli_common import enable_compilation_cache, resolve_start_iteration

    args.start_iteration = resolve_start_iteration(args.start_iteration, args.checkpoints)
    enable_compilation_cache()

    from pero_pretraining_tpu.parallel.multihost import initialize_distributed

    if initialize_distributed():  # no-op unless pod env vars are set
        import jax

        print(f"distributed: process {jax.process_index()}/{jax.process_count()}")

    model_config = AutoencoderConfig.from_definition(args.model)
    training = TrainingConfig(
        learning_rate=args.learning_rate,
        warmup_iterations=args.warmup_iterations,
        start_iteration=args.start_iteration,
        end_iteration=args.end_iteration,
        view_step=args.view_step,
        batch_size=args.batch_size,
        grad_accum=args.grad_accum,
        bfloat16=args.bfloat16,
        denoising=args.denoising,
        checkpoints_dir=args.checkpoints,
        visualizations_dir=args.visualizations,
        seed=args.seed,
        **optimizer_config_kwargs(args),
    )
    data = DataConfig(
        lmdb_path=args.lmdb_path,
        trn_path=args.trn_lines_file,
        tst_path=args.tst_lines_file,
        batch_size=args.batch_size,
        max_width=args.max_line_width,
        augmentations=args.augmentations,
        num_workers=args.num_workers,
        seed=args.seed,
    )

    mesh = create_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model))
    print(f"Mesh: {dict(mesh.shape)}")

    task = AutoencoderTask(model_config, training)
    trn_loader, tst_loader = build_loaders(data, pair_images=False)

    trn_tester = Tester(task, trn_loader, max_lines=1000)
    tst_tester = Tester(task, tst_loader)
    trn_visualizer = AutoencoderVisualizer(task, trn_loader)
    tst_visualizer = AutoencoderVisualizer(task, tst_loader)

    init_directories(args.checkpoints, args.visualizations)
    from pero_pretraining_tpu.utils.logging import init_clearml

    clearml_task, clearml_logger = init_clearml(args.project_name, args.task_name)
    logger = MetricsLogger(args.metrics_log, clearml_logger=clearml_logger)

    trainer = Trainer(task, training, mesh=mesh)
    from pero_pretraining_tpu.training.checkpoint import AsyncCheckpointer

    checkpointer = AsyncCheckpointer(keep_last=args.keep_checkpoints) if args.checkpoints else None
    trainer.on_view_step = make_view_step_handler(
        task, trainer, trn_tester, tst_tester, trn_visualizer, tst_visualizer,
        args.checkpoints, args.visualizations, logger, checkpointer=checkpointer,
    )

    state = trainer.init_state(next(iter(trn_loader)))
    state = maybe_resume(trainer, state, training)
    batches = (numeric_batch(b) for b in trn_loader.stream(args.start_iteration))
    trainer.fit(state, batches, start_iteration=args.start_iteration, end_iteration=args.end_iteration,
                steps_per_call=args.steps_per_call,
                profile_dir=args.profile_dir,
                on_preempt=make_preempt_handler(args.checkpoints))
    if checkpointer is not None:
        checkpointer.close()
    print("Training finished")
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
