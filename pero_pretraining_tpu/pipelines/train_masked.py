"""Masked pretraining CLI.

Same argparse surface as the reference (masked_pretraining/train.py:23-56),
including JSON-string --backbone/--head definitions. Run:

    python -m pero_pretraining_tpu.pipelines.train_masked \
        --trn-labels-file labels.trn --tst-labels-file labels.tst \
        --lmdb-path images.lmdb --backbone '{"type": "vit"}' ...
"""

from __future__ import annotations

import argparse

from pero_pretraining_tpu.configs import (
    BackboneConfig,
    DataConfig,
    HeadConfig,
    MeshConfig,
    TrainingConfig,
    parse_json_definition,
)
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.cli_common import (
    add_optimizer_arguments,
    build_loaders,
    init_directories,
    make_preempt_handler,
    make_view_step_handler,
    maybe_resume,
    optimizer_config_kwargs,
)
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.pipelines.visualizers import MaskedVisualizer
from pero_pretraining_tpu.training.tester import Tester
from pero_pretraining_tpu.training.trainer import Trainer
from pero_pretraining_tpu.utils.logging import MetricsLogger


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--trn-labels-file", required=True, help="Path to the training labels file.")
    parser.add_argument("--tst-labels-file", required=True, help="Path to the test labels file.")
    parser.add_argument("--lmdb-path", required=True, help="Path to the image store (LMDB or sqlite).")
    parser.add_argument("--augmentations", default=None, help="Augmentation preset (none/universal/light/strong).")

    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Split each batch into N microbatches scanned inside the step (one optimizer update; activation memory / N).")
    parser.add_argument("--learning-rate", type=float, default=0.0002)
    add_optimizer_arguments(parser)
    parser.add_argument("--masking-prob", type=float, default=0.15)
    parser.add_argument("--masking-mode", choices=("iid", "span"), default="iid")
    parser.add_argument("--span-length", type=int, default=3)
    parser.add_argument("--start-iteration", type=int, default=0,
                        help="Resume iteration; -1 = auto-resume from the latest checkpoint.")
    parser.add_argument("--end-iteration", type=int, default=100000)
    parser.add_argument("--max-line-width", type=int, default=2048)
    parser.add_argument("--buckets", default=None,
                        help="Comma-separated width buckets, e.g. 512,1024,2048 (default: single max width).")
    parser.add_argument("--warmup-iterations", type=int, default=10000)
    parser.add_argument("--fill-width", action="store_true", help="Pack lines to the full width.")
    parser.add_argument("--exact-width", action="store_true")
    parser.add_argument("--unmasked-weight", type=float, default=None)
    parser.add_argument(
        "--device-augment",
        action="store_true",
        help="Fuse the shift augmentation into the jitted step (host only left-aligns lines).",
    )
    parser.add_argument(
        "--fused-ce",
        action="store_true",
        help="Fuse the linear head into the CE loss (vocab-chunked; logits never materialize in HBM).",
    )

    parser.add_argument("--backbone", type=parse_json_definition, default="{}", help="Backbone JSON definition.")
    parser.add_argument("--head", type=parse_json_definition, default="{}", help="Head JSON definition.")

    parser.add_argument("--view-step", type=int, default=500)
    parser.add_argument("--keep-checkpoints", type=int, default=0,
                        help="Retain only the newest N checkpoints (0 = keep all).")
    parser.add_argument("--checkpoints", default=None)
    parser.add_argument("--visualizations", default=None)
    parser.add_argument("--show-masked-images", action="store_true")
    parser.add_argument("--bfloat16", action="store_true")
    parser.add_argument("--project-name", default=None, help="ClearML project (optional).")
    parser.add_argument("--task-name", default=None, help="ClearML task (optional).")
    parser.add_argument("--metrics-log", default=None, help="JSONL metrics output path.")
    parser.add_argument("--profile-dir", default=None,
                        help="Capture a device trace of a few steady-state steps to this directory.")

    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--loader-procs", type=int, default=1,
                        help="Loader PROCESSES feeding the train stream (decode scales past one "
                             "core's worth of JPEG throughput; batch order is unchanged).")
    parser.add_argument("--mesh-data", type=int, default=-1, help="Data-parallel mesh axis (-1: all devices).")
    parser.add_argument("--mesh-model", type=int, default=1, help="Tensor-parallel mesh axis.")
    parser.add_argument("--mesh-seq", type=int, default=1,
                        help="Sequence-parallel mesh axis (ring attention; use with --attention-impl ring).")
    parser.add_argument("--mesh-expert", type=int, default=1,
                        help="Expert-parallel mesh axis (MoE FFN; use with num_experts in --backbone).")
    parser.add_argument("--mesh-pipe", type=int, default=1,
                        help="Pipeline-parallel mesh axis (GPipe over the block stack; stacked-blocks layout).")
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="Fuse N optimizer steps per device program (must divide view-step).")
    parser.add_argument("--attention-impl", choices=("xla", "flash", "ring"), default="xla",
                        help="Attention kernel: XLA fused (default) or Pallas flash (long sequences).")
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

    backbone = BackboneConfig.from_definition(args.backbone)
    head = HeadConfig.from_definition(args.head)
    training = TrainingConfig(
        learning_rate=args.learning_rate,
        warmup_iterations=args.warmup_iterations,
        start_iteration=args.start_iteration,
        end_iteration=args.end_iteration,
        view_step=args.view_step,
        batch_size=args.batch_size,
        grad_accum=args.grad_accum,
        bfloat16=args.bfloat16,
        masking_prob=args.masking_prob,
        masking_mode=args.masking_mode,
        span_length=args.span_length,
        unmasked_weight=args.unmasked_weight,
        device_augment=args.device_augment,
        fused_ce=args.fused_ce,
        checkpoints_dir=args.checkpoints,
        visualizations_dir=args.visualizations,
        seed=args.seed,
        **optimizer_config_kwargs(args),
    )
    data = DataConfig(
        lmdb_path=args.lmdb_path,
        trn_path=args.trn_labels_file,
        tst_path=args.tst_labels_file,
        batch_size=args.batch_size,
        max_width=args.max_line_width,
        fill_width=args.fill_width,
        exact_width=args.exact_width,
        augmentations=args.augmentations,
        left_align=args.device_augment,
        buckets=tuple(int(b) for b in args.buckets.split(",")) if args.buckets else None,
        num_workers=args.num_workers,
        seed=args.seed,
    )

    mesh = create_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model, seq=args.mesh_seq, expert=args.mesh_expert, pipe=args.mesh_pipe))
    print(f"Mesh: {dict(mesh.shape)}")

    task = MaskedTask(backbone, head, training, attention_impl=args.attention_impl, mesh=mesh)
    trn_loader, tst_loader = build_loaders(data, pair_images=False)

    trn_tester = Tester(task, trn_loader, max_lines=1000)
    tst_tester = Tester(task, tst_loader)
    trn_visualizer = MaskedVisualizer(task, trn_loader, show_masked_images=args.show_masked_images)
    tst_visualizer = MaskedVisualizer(task, tst_loader, show_masked_images=args.show_masked_images)

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

    train_stream = trn_loader
    if args.loader_procs > 1:
        from pero_pretraining_tpu.data.multiprocess import MultiProcessLoader, spec_from_data_config

        train_stream = MultiProcessLoader(spec_from_data_config(data, pair_images=False), num_procs=args.loader_procs)
        print(f"Loader processes: {args.loader_procs}")

    state = trainer.init_state(next(iter(trn_loader)))
    state = maybe_resume(trainer, state, training)
    from pero_pretraining_tpu.training.tester import numeric_batch

    # stream() is (seed, start)-pure: resumed runs see the exact batch
    # sequence an uninterrupted run would have from this iteration
    batches = (numeric_batch(b) for b in train_stream.stream(args.start_iteration))
    trainer.fit(state, batches, start_iteration=args.start_iteration, end_iteration=args.end_iteration,
                steps_per_call=args.steps_per_call,
                profile_dir=args.profile_dir,
                on_preempt=make_preempt_handler(args.checkpoints))
    if hasattr(train_stream, "close"):
        train_stream.close()
    if checkpointer is not None:
        checkpointer.close()
    print("Training finished")
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
