"""Qualitative label-coherence check: for the top label n-grams, crop the
matching n*8-px image regions and build collage grids.

(reference: scripts/visualize_ngrams.py:53-163 — the artifact behind the
committed visualizations/*/*_3grams.png collages.)
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from random import shuffle

import numpy as np

from pero_pretraining_tpu.data.dataset import decode_image
from pero_pretraining_tpu.data.storage import open_store
from pero_pretraining_tpu.scripts.calculate_ngrams import load_ngrams
from pero_pretraining_tpu.scripts.common import load_labels
from pero_pretraining_tpu.utils.visualizer import write_png


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--labels", required=True)
    parser.add_argument("--ngrams", required=True)
    parser.add_argument("--lmdb", required=True, help="Image store.")
    parser.add_argument("--subsampling", type=int, default=8)
    parser.add_argument("--crops-per-line", type=int, default=16)
    parser.add_argument("--lines-per-image", type=int, default=None)
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--output", required=True)
    return parser.parse_args()


def search_ngrams(labels, ngrams, store, subsampling, max_samples=None):
    crops = defaultdict(list)
    counts = defaultdict(int)
    ngram_size = len(ngrams[0])
    ngrams_set = set(ngrams)

    for line_id, line_labels in labels.items():
        line = None
        for i in range(len(line_labels) - ngram_size + 1):
            ngram = tuple(line_labels[i : i + ngram_size])
            if ngram in ngrams_set:
                if line is None:
                    data = store.get(line_id)
                    if data is None:
                        break
                    line = decode_image(data)
                crops[ngram].append(line[:, i * subsampling : (i + ngram_size) * subsampling, :])
                counts[ngram] += 1
                if max_samples is not None and counts[ngram] >= max_samples:
                    ngrams_set.discard(ngram)
        if not ngrams_set:
            break
    return crops


def create_image(ngrams, crops, crops_per_line=16):
    rows = []
    for ngram in ngrams:
        ngram_crops = list(crops[ngram])
        if len(ngram_crops) > crops_per_line:
            shuffle(ngram_crops)
            ngram_crops = ngram_crops[:crops_per_line]
        elif len(ngram_crops) < 4:
            continue
        separator = np.zeros((ngram_crops[0].shape[0], 5, 3), dtype=np.uint8)
        row = []
        for i, crop in enumerate(ngram_crops):
            if i > 0:
                row.append(separator)
            row.append(crop)
        rows.append(np.concatenate(row, axis=1))
    if not rows:
        return None
    max_width = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, max_width - r.shape[1]), (0, 0))) for r in rows]
    return np.concatenate(rows, axis=0)


def main():
    args = parse_arguments()

    labels = load_labels(args.labels)
    print("Labels loaded.")
    ngrams = load_ngrams(args.ngrams)
    print("N-grams loaded.")

    with open_store(args.lmdb) as store:
        crops = search_ngrams(labels, ngrams, store, args.subsampling, max_samples=args.max_samples)
    print("Crops gathered.")

    if args.lines_per_image is not None:
        counter = 0
        while ngrams:
            image_ngrams, ngrams = ngrams[: args.lines_per_image], ngrams[args.lines_per_image :]
            image = create_image(image_ngrams, crops, crops_per_line=args.crops_per_line)
            if image is None:
                print("Nothing to visualize.")
                continue
            extension = args.output.split(".")[-1]
            write_png(args.output.replace(extension, f"{counter}.{extension}"), image)
            print(f"Image {counter} created.")
            counter += 1
    else:
        image = create_image(ngrams, crops, crops_per_line=args.crops_per_line)
        if image is None:
            print("Nothing to visualize.")
        else:
            write_png(args.output, image)
            print("Image created.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
