"""Text utilities for CTC fine-tuning: charset mapping and CER.

The reference repo delegates fine-tuning/CER to the external PERO-OCR
ecosystem (reference README.md:9; SURVEY.md §6). This framework carries its
own CTC fine-tuning + greedy-decode CER harness so the downstream
transfer-quality loop (BASELINE.md north star) closes in-repo.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

import numpy as np

BLANK_ID = 0


class Charset:
    """char <-> id mapping; id 0 is reserved for the CTC blank."""

    def __init__(self, chars: Sequence[str]):
        unique = sorted(set(chars))
        self.chars: List[str] = unique
        self._to_id: Dict[str, int] = {c: i + 1 for i, c in enumerate(unique)}

    @classmethod
    def from_texts(cls, texts: Iterable[str]) -> "Charset":
        chars = set()
        for t in texts:
            chars.update(t)
        return cls(sorted(chars))

    @classmethod
    def load(cls, path: str) -> "Charset":
        with open(path, "r") as f:
            chars = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        return cls(chars)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for c in self.chars:
                f.write(c + "\n")

    def __len__(self) -> int:
        return len(self.chars) + 1  # + blank

    def encode(self, text: str) -> List[int]:
        return [self._to_id[c] for c in text if c in self._to_id]

    def decode(self, ids: Iterable[int]) -> str:
        out = []
        for i in ids:
            if 1 <= i <= len(self.chars):
                out.append(self.chars[i - 1])
        return "".join(out)


def collapse_ctc(ids: Sequence[int], blank: int = BLANK_ID) -> List[int]:
    """Greedy CTC collapse: merge repeats, drop blanks."""
    out: List[int] = []
    prev = None
    for i in ids:
        if i != prev and i != blank:
            out.append(int(i))
        prev = i
    return out


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance (iterative DP, O(len(a)*len(b)))."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a, start=1):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i
        for j, cb in enumerate(b, start=1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return int(prev[-1])


def character_error_rate(hypotheses: Sequence[str], references: Sequence[str]) -> float:
    """Total edit distance / total reference length."""
    errors = 0
    length = 0
    for hyp, ref in zip(hypotheses, references):
        errors += edit_distance(hyp, ref)
        length += len(ref)
    return errors / max(length, 1)
