"""Concatenate consecutive labeled lines into >= min_length-token samples.

Produces the `{"images": [...], "labels": [...]}` multi-segment records
PackedDataset consumes, with a label separator between lines and an
equidistant train/test split towards a target test size (reference:
scripts/merge_lines_dataset.py:19-93).
"""

from __future__ import annotations

import argparse
import json

from pero_pretraining_tpu.data.storage import SqliteStore, open_store


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="Records store with per-line labels.")
    parser.add_argument("--trn-output", required=True)
    parser.add_argument("--tst-output", required=True)
    parser.add_argument("--tst-target-size", type=int, default=1000)
    parser.add_argument("--min-length", type=int, default=320)
    parser.add_argument("--separator", type=int, default=0)
    return parser.parse_args()


def estimate_concatenated_lines_count(store, min_length: int, sample_size: int = 10000) -> float:
    input_size = len(store)
    step = max(1, input_size // sample_size)
    counter = 0
    current_length = 0
    sampled = 0
    for i in range(0, input_size, step):
        record = store.get(f"{i:10d}")
        if record is None:
            continue
        labels = json.loads(record)["labels"]
        current_length += len(labels) + 1
        sampled += 1
        if current_length >= min_length:
            counter += 1
            current_length = 0
    return counter * input_size / max(sampled, 1)


def main():
    args = parse_arguments()

    in_store = open_store(args.input)
    trn_store = open_store(args.trn_output, readonly=False)
    tst_store = open_store(args.tst_output, readonly=False)

    input_size = len(in_store)
    estimated = estimate_concatenated_lines_count(in_store, args.min_length)
    print(f"Estimated number of lines after concatenation {estimated} from {input_size} lines.")

    tst_count = 0
    trn_count = 0
    length_sum = 0
    next_sample = {"images": [], "labels": []}

    for i in range(input_size):
        record = in_store.get(f"{i:10d}")
        if record is None:
            continue
        sample = json.loads(record)
        next_sample["images"].append(sample["image"])
        try:
            next_sample["labels"] += [int(l) for l in sample["labels"]]
        except ValueError as e:
            print(f"Skipping line {i} due to error: {e}")
            continue
        next_sample["labels"].append(args.separator)

        if len(next_sample["labels"]) >= args.min_length:
            total = tst_count + trn_count
            want_tst = (
                tst_count < args.tst_target_size
                and tst_count / (total + 1) < args.tst_target_size / max(estimated, 1)
            )
            if want_tst:
                tst_store.put(f"{tst_count:10d}", json.dumps(next_sample).encode())
                tst_count += 1
            else:
                trn_store.put(f"{trn_count:10d}", json.dumps(next_sample).encode())
                trn_count += 1
            length_sum += len(next_sample["labels"])
            next_sample = {"images": [], "labels": []}
            if total % 10000 == 0 and total > 0:
                print(
                    f"Processed {i} lines. Average length: {length_sum / total:.1f}, "
                    f"{tst_count} test samples, {trn_count} training samples."
                )

    for store in (trn_store, tst_store):
        if isinstance(store, SqliteStore):
            store.commit()
        store.close()
    in_store.close()
    print(f"Done: {trn_count} train, {tst_count} test samples.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
