"""Character n-gram language model for CTC shallow fusion.

The reference delegates decoding to the external PERO-OCR stack, which fuses
a language model during CTC beam search (reference README.md:9; SURVEY.md §6
"Downstream fine-tuned CER ... external PERO-OCR fine-tuning"). This module
provides the in-repo equivalent: a character-level n-gram LM with stupid
backoff (Brants et al., 2007) — the standard choice for shallow fusion where
only relative scores matter, not normalized perplexity.

Training is a pure host-side counting pass (no device work); scoring during
beam search is dict lookups, vectorized over the whole charset per query so
the decoder does one LM call per (beam, frame) instead of per candidate char.
"""

from __future__ import annotations

import json
import math
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

BOS = "\x02"  # sentence-start marker, never appears in real transcriptions

_NEG_INF = float("-inf")


class CharNgramLM:
    """Stupid-backoff character n-gram LM.

    score(c | context) = count(context + c) / count(context) when seen,
    else backoff_factor * score(c | context[1:]), grounding in an add-one
    smoothed unigram over the training charset.
    """

    def __init__(self, order: int = 5, backoff_factor: float = 0.4):
        if order < 1:
            raise ValueError(f"order must be >= 1, got {order}")
        self.order = order
        self.backoff_factor = backoff_factor
        # context string -> {next char -> count}; "" holds unigram counts
        self.counts: Dict[str, Dict[str, int]] = {"": {}}
        self.context_totals: Dict[str, int] = {"": 0}
        self.vocab: List[str] = []

    # Training ----------------------------------------------------------------
    def fit(self, texts: Iterable[str]) -> "CharNgramLM":
        counts = self.counts
        totals = self.context_totals
        vocab = set()
        for text in texts:
            if not text:
                continue
            vocab.update(text)
            padded = BOS * (self.order - 1) + text
            for i in range(self.order - 1, len(padded)):
                char = padded[i]
                for n in range(self.order):
                    context = padded[i - n : i]
                    bucket = counts.setdefault(context, {})
                    bucket[char] = bucket.get(char, 0) + 1
                    totals[context] = totals.get(context, 0) + 1
        self.vocab = sorted(vocab)
        return self

    # Scoring -----------------------------------------------------------------
    def initial_context(self) -> str:
        return BOS * (self.order - 1)

    def advance(self, context: str, char: str) -> str:
        return (context + char)[-(self.order - 1) :] if self.order > 1 else ""

    def logp(self, context: str, char: str) -> float:
        """log P(char | context) under stupid backoff."""
        return float(self.logp_all(context, [char])[0])

    def logp_all(self, context: str, chars: Sequence[str]) -> np.ndarray:
        """log P(c | context) for every c in chars, one backoff walk total."""
        context = context[-(self.order - 1) :] if self.order > 1 else ""
        out = np.full(len(chars), _NEG_INF, dtype=np.float64)
        remaining = list(range(len(chars)))
        backoff_penalty = 0.0
        while remaining:
            bucket = self.counts.get(context)
            if bucket is not None:
                total = self.context_totals[context]
                still = []
                for i in remaining:
                    count = bucket.get(chars[i], 0)
                    if count > 0:
                        out[i] = backoff_penalty + math.log(count / total)
                    else:
                        still.append(i)
                remaining = still
            if not remaining:
                break
            if not context:
                floor_total = self.context_totals.get("", 0) + len(self.vocab) + 1
                floor = backoff_penalty + math.log(1.0 / floor_total)
                for i in remaining:
                    out[i] = floor
                break
            context = context[1:]
            backoff_penalty += math.log(self.backoff_factor)
        return out

    def sequence_logp(self, text: str) -> float:
        """Sum of per-char conditional log probs (for tests/tuning)."""
        context = self.initial_context()
        total = 0.0
        for char in text:
            total += self.logp(context, char)
            context = self.advance(context, char)
        return total

    # Serialization (JSON: human-inspectable, no pickle trust issues) ---------
    def save(self, path: str) -> None:
        payload = {
            "order": self.order,
            "backoff_factor": self.backoff_factor,
            "vocab": self.vocab,
            "counts": self.counts,
        }
        with open(path, "w") as f:
            json.dump(payload, f)

    @classmethod
    def load(cls, path: str) -> "CharNgramLM":
        with open(path, "r") as f:
            payload = json.load(f)
        lm = cls(order=payload["order"], backoff_factor=payload["backoff_factor"])
        lm.vocab = payload["vocab"]
        lm.counts = payload["counts"]
        lm.context_totals = {
            context: sum(bucket.values()) for context, bucket in lm.counts.items()
        }
        return lm
