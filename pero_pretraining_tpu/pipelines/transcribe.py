"""Inference CLI: transcribe line images with a fine-tuned CTC recognizer.

    python -m pero_pretraining_tpu.pipelines.transcribe \
        --lines-path ids.txt --lmdb-path images.lmdb \
        --checkpoint ckpt/checkpoint_050000.msgpack --charset charset.txt \
        --backbone '{"type": "vit"}' --output transcriptions.tsv

`--lines-path` lists one image id per line (a labels file also works — only
the first token is used). Output rows: `"<image_id>\\t<text>"`.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.configs import BackboneConfig, TrainingConfig, parse_json_definition
from pero_pretraining_tpu.data.batching import BatchCreator
from pero_pretraining_tpu.data.dataset import LinesDataset
from pero_pretraining_tpu.data.loader import DataLoader
from pero_pretraining_tpu.pipelines.ctc import CTCTask
from pero_pretraining_tpu.scripts.common import load_checkpoint_tree, split_variables
from pero_pretraining_tpu.utils.text import BLANK_ID, Charset


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lines-path", required=True)
    parser.add_argument("--lmdb-path", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--charset", required=True)
    parser.add_argument("--backbone", type=parse_json_definition, default="{}")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--max-line-width", type=int, default=2048)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--output", required=True)
    parser.add_argument("--decoder", choices=("greedy", "beam"), default="greedy")
    parser.add_argument("--beam-width", type=int, default=16)
    parser.add_argument("--lm-path", default=None, help="Char n-gram LM (scripts/fit_char_lm.py) for shallow fusion.")
    parser.add_argument("--lm-weight", type=float, default=0.5)
    parser.add_argument("--insertion-bonus", type=float, default=0.0)
    return parser.parse_args()


def main():
    args = parse_arguments()

    from pero_pretraining_tpu.pipelines.cli_common import enable_compilation_cache

    enable_compilation_cache()

    charset = Charset.load(args.charset)
    backbone = BackboneConfig.from_definition(args.backbone)
    task = CTCTask(backbone, charset, TrainingConfig())

    params, model_state = split_variables(load_checkpoint_tree(args.checkpoint))
    params = jax.device_put(params)
    model_state = jax.device_put(model_state)
    print(f"Model loaded ({len(charset)} classes)")

    dataset = LinesDataset(args.lmdb_path, args.lines_path, max_width=args.max_line_width)
    loader = DataLoader(
        dataset,
        BatchCreator(pad_to=args.max_line_width, seed=0),
        batch_size=args.batch_size,
        shuffle=False,
        num_workers=args.num_workers,
        drop_last=False,
    )

    lm = None
    if args.lm_path:
        from pero_pretraining_tpu.utils.lm import CharNgramLM

        lm = CharNgramLM.load(args.lm_path)
        print(f"LM loaded: order {lm.order}, {len(lm.vocab)} chars")

    @jax.jit
    def decode(params, model_state, images, image_masks):
        logits, _ = task._apply(params, model_state, images, jax.random.PRNGKey(0), train=False)
        path = jnp.argmax(logits.astype(jnp.float32), axis=-1)
        return jnp.where(image_masks == 1, path, BLANK_ID)

    @jax.jit
    def frame_log_probs(params, model_state, images):
        logits, _ = task._apply(params, model_state, images, jax.random.PRNGKey(0), train=False)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def transcribe_batch(batch):
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        if args.decoder == "greedy":
            paths = np.asarray(decode(params, model_state, images, jnp.asarray(batch["image_masks"])))
            return task.decode_paths(paths)
        from pero_pretraining_tpu.utils.ctc_decode import decode_batch

        log_probs = np.asarray(frame_log_probs(params, model_state, images))
        return decode_batch(
            log_probs,
            np.asarray(batch["image_masks"]),
            charset,
            beam_width=args.beam_width,
            lm=lm,
            lm_weight=args.lm_weight,
            insertion_bonus=args.insertion_bonus,
        )

    count = 0
    with open(args.output, "w") as out:
        for batch in loader:
            for line_id, text in zip(batch["ids"], transcribe_batch(batch)):
                out.write(f"{line_id}\t{text}\n")
                count += 1
    print(f"Transcribed {count} lines -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
