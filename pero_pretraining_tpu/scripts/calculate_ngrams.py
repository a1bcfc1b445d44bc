"""Count label n-grams across a labels file and save sorted counts.

Output rows: `"l1 l2 l3\\t<count>"` (reference:
scripts/calculate_ngrams.py:34-67). Used to pick frequent code n-grams for
the qualitative "do codes mean visual things" collages.
"""

from __future__ import annotations

import argparse
from collections import defaultdict

from pero_pretraining_tpu.scripts.common import load_labels


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--labels", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--n", type=int, default=3)
    parser.add_argument("--top", type=int, default=None)
    return parser.parse_args()


def calculate_ngrams(data, n: int):
    ngrams = defaultdict(int)
    for line_labels in data.values():
        for start in range(len(line_labels) - n + 1):
            ngrams[tuple(line_labels[start : start + n])] += 1
    return ngrams


def save_ngrams(path: str, ngrams):
    with open(path, "w") as f:
        for ngram, count in ngrams:
            f.write(f"{' '.join(str(l) for l in ngram)}\t{count}\n")


def load_ngrams(path: str):
    data = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                ngram, _ = line.split("\t")
                data.append(tuple(int(l) for l in ngram.split()))
    return data


def main():
    args = parse_arguments()

    lines = load_labels(args.labels)
    print("Labels loaded.")

    ngrams = calculate_ngrams(lines, args.n)
    print("N-grams calculated.")

    sorted_ngrams = sorted(ngrams.items(), key=lambda item: item[1], reverse=True)
    if args.top is not None:
        sorted_ngrams = sorted_ngrams[: args.top]

    save_ngrams(args.output, sorted_ngrams)
    print("N-grams saved.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
