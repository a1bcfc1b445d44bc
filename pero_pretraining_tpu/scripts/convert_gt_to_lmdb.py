"""Build the PackedDataset records store from a ground-truth text file.

Input rows: `"some_file_name.jpg token1 token2 ..."`; each becomes a JSON
record `{"image": ..., "labels": [...]}` keyed by zero-padded index, append-
capable via the existing entry count (reference:
scripts/convert_gt_to_lmdb.py:19-46). Writes LMDB when available, sqlite
otherwise (data/storage.py).
"""

from __future__ import annotations

import argparse
import json

from pero_pretraining_tpu.data.storage import SqliteStore, open_store


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="Input text file.")
    parser.add_argument("--output", required=True, help="Output records store (LMDB dir or .sqlite).")
    return parser.parse_args()


def main():
    args = parse_arguments()

    store = open_store(args.output, readonly=False)
    offset = len(store)
    print("Starting from offset", offset)

    count = 0
    with open(args.input, "r") as f:
        for i, line in enumerate(f):
            parts = line.strip().split(" ")
            image_path = parts[0]
            labels = parts[1:]
            if not labels:
                print("Warning: No labels for", image_path)
                continue
            store.put(f"{offset + i:10d}", json.dumps({"image": image_path, "labels": labels}).encode())
            count += 1
            if i % 10000 == 0 and i > 0:
                print(f"Processed {i} lines")
    if isinstance(store, SqliteStore):
        store.commit()
    store.close()
    print(f"Wrote {count} records to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
