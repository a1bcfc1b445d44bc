"""CTC fine-tuning CLI: pretrained backbone -> text recognizer, CER eval.

    python -m pero_pretraining_tpu.pipelines.finetune_ctc \
        --trn-transcriptions trn.tsv --tst-transcriptions tst.tsv \
        --lmdb-path images.lmdb --pretrained-checkpoint ckpt.msgpack \
        --backbone '{"type": "vit"}'

Transcription files: `"<image_id>\\t<text>"` per line. The charset is built
from the training transcriptions unless --charset is given.
"""

from __future__ import annotations

import argparse

from pero_pretraining_tpu.configs import BackboneConfig, MeshConfig, TrainingConfig, parse_json_definition
from pero_pretraining_tpu.data.augment import build_augmentations
from pero_pretraining_tpu.data.batching import BatchCreator, CTCBatchCreator
from pero_pretraining_tpu.data.dataset import TranscriptionDataset
from pero_pretraining_tpu.data.loader import DataLoader
from pero_pretraining_tpu.parallel.mesh import create_mesh
from pero_pretraining_tpu.pipelines.cli_common import (
    make_preempt_handler,
    add_optimizer_arguments,
    init_directories,
    maybe_resume,
    optimizer_config_kwargs,
)
from pero_pretraining_tpu.pipelines.ctc import CTCTask, CTCTester
from pero_pretraining_tpu.training.checkpoint import get_checkpoint_path
from pero_pretraining_tpu.training.tester import numeric_batch
from pero_pretraining_tpu.training.trainer import Trainer
from pero_pretraining_tpu.utils.logging import MetricsLogger
from pero_pretraining_tpu.utils.text import Charset


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--trn-transcriptions", required=True)
    parser.add_argument("--tst-transcriptions", required=True)
    parser.add_argument("--lmdb-path", required=True)
    parser.add_argument("--charset", default=None, help="Charset file (one char per line); default: build from train.")
    parser.add_argument("--pretrained-checkpoint", default=None, help="Pretraining checkpoint to initialize the backbone.")
    parser.add_argument("--augmentations", default=None)

    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Split each batch into N microbatches scanned inside the step (one optimizer update; activation memory / N).")
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    add_optimizer_arguments(parser)
    parser.add_argument("--start-iteration", type=int, default=0,
                        help="Resume iteration; -1 = auto-resume from the latest checkpoint.")
    parser.add_argument("--end-iteration", type=int, default=50000)
    parser.add_argument("--max-line-width", type=int, default=2048)
    parser.add_argument("--max-label-len", type=int, default=256)
    parser.add_argument("--warmup-iterations", type=int, default=1000)

    parser.add_argument("--backbone", type=parse_json_definition, default="{}")

    parser.add_argument("--view-step", type=int, default=500)
    parser.add_argument("--keep-checkpoints", type=int, default=0,
                        help="Retain only the newest N checkpoints (0 = keep all).")
    parser.add_argument("--checkpoints", default=None)
    parser.add_argument("--bfloat16", action="store_true")
    parser.add_argument("--metrics-log", default=None)

    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--mesh-data", type=int, default=-1)
    parser.add_argument("--mesh-model", type=int, default=1)
    parser.add_argument("--mesh-seq", type=int, default=1,
                        help="Sequence-parallel mesh axis (ring attention; use with --attention-impl ring).")
    parser.add_argument("--mesh-expert", type=int, default=1,
                        help="Expert-parallel mesh axis (MoE FFN; use with num_experts in --backbone).")
    parser.add_argument("--mesh-pipe", type=int, default=1,
                        help="Pipeline-parallel mesh axis (GPipe over the block stack; stacked-blocks layout).")
    parser.add_argument("--attention-impl", choices=("xla", "flash", "ring"), default="xla",
                        help="Attention kernel: XLA fused (default) or Pallas flash (long sequences).")
    parser.add_argument("--decoder", choices=("greedy", "beam"), default="greedy",
                        help="CER decoder: greedy argmax or prefix beam search (+ optional LM fusion).")
    parser.add_argument("--beam-width", type=int, default=16)
    parser.add_argument("--lm-path", default=None, help="Char n-gram LM (scripts/fit_char_lm.py).")
    parser.add_argument("--lm-weight", type=float, default=0.5)
    parser.add_argument("--insertion-bonus", type=float, default=0.0)
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
    training = TrainingConfig(
        learning_rate=args.learning_rate,
        warmup_iterations=args.warmup_iterations,
        start_iteration=args.start_iteration,
        end_iteration=args.end_iteration,
        view_step=args.view_step,
        batch_size=args.batch_size,
        grad_accum=args.grad_accum,
        bfloat16=args.bfloat16,
        checkpoints_dir=args.checkpoints,
        seed=args.seed,
        **optimizer_config_kwargs(args),
    )

    augmentations = build_augmentations(args.augmentations)
    trn_dataset = TranscriptionDataset(args.lmdb_path, args.trn_transcriptions, augmentations, args.max_line_width)
    tst_dataset = TranscriptionDataset(args.lmdb_path, args.tst_transcriptions, None, args.max_line_width)

    charset = Charset.load(args.charset) if args.charset else Charset.from_texts(trn_dataset.texts())
    print(f"Charset: {len(charset)} classes (incl. blank)")

    base_creator = BatchCreator(pad_to=args.max_line_width, seed=args.seed)
    creator = CTCBatchCreator(charset, base_creator, max_label_len=args.max_label_len)
    trn_loader = DataLoader(trn_dataset, creator, batch_size=args.batch_size, shuffle=True, num_workers=args.num_workers, seed=args.seed)
    tst_loader = DataLoader(tst_dataset, creator, batch_size=args.batch_size, shuffle=False, num_workers=args.num_workers)

    mesh = create_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model, seq=args.mesh_seq, expert=args.mesh_expert, pipe=args.mesh_pipe))
    print(f"Mesh: {dict(mesh.shape)}")

    task = CTCTask(backbone, charset, training, attention_impl=args.attention_impl, mesh=mesh)
    trainer = Trainer(task, training, mesh=mesh)

    lm = None
    if args.lm_path:
        from pero_pretraining_tpu.utils.lm import CharNgramLM

        lm = CharNgramLM.load(args.lm_path)
        print(f"LM loaded: order {lm.order}, {len(lm.vocab)} chars")
    decoder_kwargs = dict(
        decoder=args.decoder,
        beam_width=args.beam_width,
        lm=lm,
        lm_weight=args.lm_weight,
        insertion_bonus=args.insertion_bonus,
    )
    trn_tester = CTCTester(task, trn_loader, max_lines=1000, **decoder_kwargs)
    tst_tester = CTCTester(task, tst_loader, **decoder_kwargs)
    logger = MetricsLogger(args.metrics_log)
    init_directories(args.checkpoints)

    from pero_pretraining_tpu.training.checkpoint import AsyncCheckpointer

    checkpointer = AsyncCheckpointer(keep_last=args.keep_checkpoints) if args.checkpoints else None

    def handler(iteration, state, elapsed, count, metrics):
        print(
            f"Iteration: {iteration}, time: {elapsed:.2f} s, speed: {count / elapsed:.2f} it/s, "
            f"loss: {metrics.get('loss', float('nan')):.6f}"
        )
        if checkpointer is not None:
            checkpointer.save(state, get_checkpoint_path(args.checkpoints, iteration))
        for name, tester in (("trn", trn_tester), ("tst", tst_tester)):
            result = tester.test(state)
            print(f"TEST {name} iteration:{iteration} loss:{result['loss']:.6f} cer:{result['cer']:.4f}")
            if logger is not None:
                logger.report_scalar("loss", name, result["loss"], iteration)
                logger.report_scalar("cer", name, result["cer"], iteration)

    trainer.on_view_step = handler

    import jax

    sample = next(iter(trn_loader))
    variables = task.init_variables(jax.random.PRNGKey(args.seed), sample)
    if args.pretrained_checkpoint:
        variables = task.load_pretrained_backbone(variables, args.pretrained_checkpoint)
        print(f"Loaded pretrained backbone from {args.pretrained_checkpoint}")

        # rebuild trainer state around grafted variables
        from pero_pretraining_tpu.parallel.sharding import param_shardings, replicated
        from pero_pretraining_tpu.training.state import TrainState

        variables = dict(variables)
        params = variables.pop("params")
        params = jax.device_put(params, param_shardings(params, mesh))
        model_state = jax.device_put(variables, replicated(mesh))
        opt_state = jax.jit(trainer.tx.init)(params)
        state = TrainState.create(params, model_state, opt_state, args.seed)
    else:
        state = trainer.init_state(sample)

    state = maybe_resume(trainer, state, training)
    batches = (numeric_batch(b) for b in trn_loader.stream(args.start_iteration))
    trainer.fit(state, batches, start_iteration=args.start_iteration, end_iteration=args.end_iteration,
                on_preempt=make_preempt_handler(args.checkpoints))
    if checkpointer is not None:
        checkpointer.close()
    print("Training finished")
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
