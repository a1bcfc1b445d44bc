"""Fit a character n-gram LM for CTC beam-search fusion.

    python -m pero_pretraining_tpu.scripts.fit_char_lm \
        --transcriptions trn.tsv --order 5 --output char_lm.json

Input: transcription TSV ("<image_id>\\t<text>" per line, the format
finetune_ctc consumes) or plain text with --plain-text. The LM feeds
`--decoder beam --lm-path` in transcribe/finetune_ctc, mirroring the external
PERO-OCR production decoder the reference relies on (reference README.md:9).
"""

from __future__ import annotations

import argparse


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--transcriptions", required=True, help="TSV id\\ttext (or plain text with --plain-text)")
    parser.add_argument("--plain-text", action="store_true", help="Treat each input line as raw text (no id column).")
    parser.add_argument("--order", type=int, default=5)
    parser.add_argument("--backoff-factor", type=float, default=0.4)
    parser.add_argument("--output", required=True)
    return parser.parse_args()


def read_texts(path: str, plain_text: bool):
    texts = []
    with open(path, "r") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if plain_text:
                texts.append(line)
            else:
                parts = line.split("\t", 1)
                texts.append(parts[1] if len(parts) == 2 else "")
    return [t for t in texts if t]


def main():
    args = parse_arguments()
    from pero_pretraining_tpu.utils.lm import CharNgramLM

    texts = read_texts(args.transcriptions, args.plain_text)
    print(f"Training order-{args.order} char LM on {len(texts)} lines")
    lm = CharNgramLM(order=args.order, backoff_factor=args.backoff_factor).fit(texts)
    lm.save(args.output)
    print(f"Saved LM ({len(lm.vocab)} chars, {len(lm.counts)} contexts) -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
