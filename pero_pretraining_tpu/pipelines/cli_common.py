"""Shared CLI wiring for the three training pipelines.

Mirrors the reference's train.py structure (init datasets/testers/
visualizers/trainer + a view-step handler that checkpoints, evaluates both
splits, renders PNGs and reports scalars; reference:
masked_pretraining/train.py:130-216).
"""

from __future__ import annotations

import os
from typing import Optional

from pero_pretraining_tpu.configs import DataConfig, TrainingConfig
from pero_pretraining_tpu.data.augment import build_augmentations
from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.dataset import LinesDataset, PackedDataset
from pero_pretraining_tpu.data.loader import DataLoader
from pero_pretraining_tpu.training.checkpoint import (
    get_checkpoint_path,
    get_visualization_path,
    load_checkpoint,
    save_checkpoint,
)
from pero_pretraining_tpu.training.tester import Tester
from pero_pretraining_tpu.utils.logging import MetricsLogger
from pero_pretraining_tpu.utils.visualizer import write_png


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist compiled programs across runs (first compile of the flagship
    model is ~30-60 s; subsequent CLI invocations then start instantly).
    Respects PERO_COMPILATION_CACHE; set it to '0' to disable."""
    env = os.environ.get("PERO_COMPILATION_CACHE")
    if env == "0":
        return
    cache_dir = cache_dir or env or os.path.expanduser("~/.cache/pero_pretraining_tpu/xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        print(f"compilation cache disabled: {e}")


def add_optimizer_arguments(parser) -> None:
    """Production optimizer knobs shared by all training CLIs (extensions —
    the reference only has Adam + warmup-constant, train.py:146-147)."""
    parser.add_argument("--schedule", choices=("constant", "cosine"), default="constant",
                        help="LR after warmup: constant (reference) or cosine decay to --min-lr-fraction.")
    parser.add_argument("--min-lr-fraction", type=float, default=0.0,
                        help="Cosine floor as a fraction of --learning-rate.")
    parser.add_argument("--weight-decay", type=float, default=0.0,
                        help="AdamW decoupled weight decay on matrix-shaped params only (biases/norm "
                             "scales excluded; 0 = plain Adam). Coupled to the LR, so it scales with "
                             "--backbone-lr-scale for the backbone group.")
    parser.add_argument("--grad-clip", type=float, default=0.0,
                        help="Global-norm gradient clipping (0 = off).")
    parser.add_argument("--backbone-lr-scale", type=float, default=1.0,
                        help="LR multiplier for the 'backbone' params (fine-tuning: protect pretrained features).")
    parser.add_argument("--skip-nonfinite", type=int, default=0,
                        help="Skip (zero) updates with non-finite grads — params are never poisoned — "
                             "and abort loudly after N consecutive skipped steps (0 = off).")
    parser.add_argument("--moments-dtype", default="float32", choices=("float32", "bfloat16", "int8"),
                        help="Adam moment storage dtype. float32 (default) matches the reference's "
                             "torch Adam numerics. bfloat16 halves optimizer-state HBM traffic "
                             "(+5.3%% wall on the flagship step) and is the recommended opt-in for "
                             "long PRETRAINING runs (1000-step flagship A/B parity, "
                             "docs/bench_moments_parity.json) — but measured +1.15 CER points on a "
                             "budgeted CTC fine-tune (docs/RENDERED_EXPERIMENT.md), which is why it "
                             "is not the default. int8 stores blockwise-quantized moments (4x less "
                             "traffic, 2 bytes/param). Compute stays fp32 for all; checkpoint "
                             "restore verifies moment dtypes and raises on a cross-dtype load.")
    parser.add_argument("--shard-opt-state", action="store_true",
                        help="ZeRO-1: partition optimizer state over the data mesh axis "
                             "(reduce-scatter grads into the Adam update, all-gather param deltas); "
                             "per-chip optimizer HBM traffic divides by the data size. "
                             "No effect on a 1-device data axis.")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3/FSDP: fully shard PARAMS over the data mesh axis (GSPMD "
                             "all-gathers each weight just-in-time and reduce-scatters its grad); "
                             "per-chip parameter residency divides by the data size. Optimizer "
                             "moments inherit the sharded layout; composes with --shard-opt-state.")


def optimizer_config_kwargs(args) -> dict:
    return dict(
        schedule=args.schedule,
        min_lr_fraction=args.min_lr_fraction,
        weight_decay=args.weight_decay,
        grad_clip=args.grad_clip,
        backbone_lr_scale=args.backbone_lr_scale,
        skip_nonfinite=args.skip_nonfinite,
        moments_dtype=args.moments_dtype,
        shard_opt_state=args.shard_opt_state,
        fsdp=args.fsdp,
    )


def build_dataset(
    lines_path: str,
    data_config: DataConfig,
    augmentations_name: Optional[str],
    pair_images: bool,
):
    """Dataset-class choice follows the reference's rule: a path containing
    'lmdb' (or pointing at a KV store) selects the packed/records dataset
    (reference: masked_pretraining/train.py:80)."""
    augmentations = build_augmentations(augmentations_name)
    if "lmdb" in lines_path or lines_path.endswith((".sqlite", ".db")):
        return PackedDataset(
            data_config.lmdb_path,
            lines_path,
            augmentations=augmentations,
            pair_images=pair_images,
            max_width=data_config.max_width,
            fill_width=data_config.fill_width,
            exact_width=data_config.exact_width,
        )
    return LinesDataset(
        data_config.lmdb_path,
        lines_path,
        augmentations=augmentations,
        pair_images=pair_images,
        max_width=data_config.max_width,
    )


def _make_loader(dataset, data_config: DataConfig, shuffle: bool, seed: int):
    if data_config.buckets:
        from pero_pretraining_tpu.data.bucketing import BucketedDataLoader

        kwargs = dict(
            same_left_paddings=data_config.same_left_paddings,
            left_align=data_config.left_align,
        )
        return BucketedDataLoader(
            dataset, buckets=data_config.buckets, batch_size=data_config.batch_size,
            shuffle=shuffle, num_workers=data_config.num_workers, seed=seed,
            subsampling_factor=data_config.subsampling_factor, creator_kwargs=kwargs,
        )
    creator = BatchCreator(
        pad_to=data_config.max_width,
        subsampling_factor=data_config.subsampling_factor,
        crop_width=data_config.crop_width,
        crop_step=data_config.crop_step,
        same_left_paddings=data_config.same_left_paddings,
        seed=seed,
        left_align=data_config.left_align,
    )
    return DataLoader(
        dataset, creator, batch_size=data_config.batch_size, shuffle=shuffle,
        num_workers=data_config.num_workers, prefetch_batches=data_config.prefetch,
        seed=seed,
    )


def build_train_loader(data_config: DataConfig, pair_images: bool = False):
    """Train loader only (used by the multi-process sharded loader's workers,
    which must never pay for constructing the test dataset)."""
    trn_dataset = build_dataset(data_config.trn_path, data_config, data_config.augmentations, pair_images)
    return _make_loader(trn_dataset, data_config, shuffle=data_config.shuffle, seed=data_config.seed)


def build_loaders(data_config: DataConfig, pair_images: bool = False):
    trn_loader = build_train_loader(data_config, pair_images)
    tst_dataset = build_dataset(data_config.tst_path, data_config, None, pair_images)
    tst_loader = _make_loader(tst_dataset, data_config, shuffle=False, seed=0)
    return trn_loader, tst_loader


def report(iteration: int, name: str, result: dict, lr: float, logger: Optional[MetricsLogger] = None) -> None:
    """Stdout + JSONL scalar reporting (reference: train.py:169-190)."""
    errors_keys = sorted(
        [k for k in result if k.startswith("errors_")], key=lambda k: int(k.split("_")[-1])
    )
    errors_str = "|".join(f"{result[k]:.4f}" for k in errors_keys)
    print(f"TEST {name} iteration:{iteration} loss:{result['loss']:.6f} errors:{errors_str} lr:{lr:.6e}")
    if logger is not None:
        logger.report_scalar("loss", name, result["loss"], iteration)
        for key in errors_keys:
            logger.report_scalar(f"top-{key.split('_')[-1]}_error", name, result[key], iteration)


def make_view_step_handler(
    task,
    trainer,
    trn_tester: Tester,
    tst_tester: Tester,
    trn_visualizer,
    tst_visualizer,
    checkpoints_dir: Optional[str],
    visualizations_dir: Optional[str],
    logger: Optional[MetricsLogger] = None,
    checkpointer=None,
):
    def handler(iteration, state, elapsed, count, metrics):
        lines = count * trainer.config.batch_size
        print(
            f"Iteration: {iteration}, time: {elapsed:.2f} s, speed: {count / elapsed:.2f} it/s "
            f"({lines / elapsed:.1f} lines/s), loss: {metrics.get('loss', float('nan')):.6f}"
        )
        if checkpoints_dir:
            path = get_checkpoint_path(checkpoints_dir, iteration)
            if checkpointer is not None:
                checkpointer.save(state, path)  # IO overlaps the next steps
            else:
                save_checkpoint(state, path)
        lr = trainer.current_lr(state)
        if trn_tester is not None:
            report(iteration, trn_tester.dataloader.name(), trn_tester.test(state), lr, logger)
        if tst_tester is not None:
            report(iteration, tst_tester.dataloader.name(), tst_tester.test(state), lr, logger)
        if visualizations_dir:
            if trn_visualizer is not None:
                write_png(get_visualization_path(visualizations_dir, iteration, "trn"), trn_visualizer.visualize(state))
            if tst_visualizer is not None:
                write_png(get_visualization_path(visualizations_dir, iteration, "tst"), tst_visualizer.visualize(state))

    return handler


def make_preempt_handler(checkpoints_dir: Optional[str]):
    """fit(on_preempt=...) callback: synchronous checkpoint save on SIGTERM/
    SIGINT (preemption), so `--start-iteration -1` resumes exactly where the
    preempted run stopped."""
    if not checkpoints_dir:
        return None

    def handler(iteration, state):
        path = get_checkpoint_path(checkpoints_dir, iteration)
        save_checkpoint(state, path)
        print(f"preemption checkpoint written: {path}")

    return handler


def init_directories(*directories):
    for directory in directories:
        if directory:
            os.makedirs(directory, exist_ok=True)


def resolve_start_iteration(start_iteration: int, checkpoints_dir: Optional[str]) -> int:
    """`--start-iteration -1` = auto-resume from the latest checkpoint in
    --checkpoints (0 when none exists)."""
    if start_iteration >= 0:
        return start_iteration
    from pero_pretraining_tpu.training.checkpoint import find_latest_checkpoint

    if not checkpoints_dir:
        return 0
    path, iteration = find_latest_checkpoint(checkpoints_dir)
    if path is None:
        print("auto-resume: no checkpoint found, starting fresh")
        return 0
    print(f"auto-resume: latest checkpoint is {path}")
    return iteration


def maybe_resume(trainer, state, training_config: TrainingConfig):
    """Resume = load the checkpoint at --start-iteration (reference:
    train.py:243-251), but restoring the FULL train state. Data order is
    restored separately: the CLIs feed training from
    `loader.stream(start_iteration)`, which is a pure function of
    (seed, start) — the reference restarts data order from scratch on
    resume (SURVEY.md §5)."""
    if training_config.start_iteration > 0 and training_config.checkpoints_dir:
        path = get_checkpoint_path(training_config.checkpoints_dir, training_config.start_iteration)
        state = trainer.place_state(load_checkpoint(state, path))
        print(f"Resumed from {path} at step {int(state.step)}")
    return state
