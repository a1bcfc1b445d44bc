"""CTC prefix beam search with optional n-gram LM shallow fusion.

The reference evaluates recognizers through the external PERO-OCR stack whose
production decoder is beam search + LM (SURVEY.md §6); in-repo we previously
had greedy decode only (`utils/text.py::collapse_ctc`). This implements the
standard CTC prefix beam search (Hannun et al., 2014 "First-Pass Large
Vocabulary Continuous Speech Recognition using Bi-Directional Recurrent DNNs")
in log space, with LM shallow fusion: each prefix extension by char c adds

    lm_weight * log P_lm(c | prefix) + insertion_bonus

to the extension mass, so LM evidence competes inside the beam rather than
being a post-hoc rerank.

Decoding is host-side by design: the search is sequential and data-dependent
(dynamic prefix set), the opposite of what XLA wants, while the per-frame
posteriors it consumes are produced in one batched device pass. For line OCR
shapes (S <= 512 frames, beams <= 32) the Python loop is milliseconds per
line and never the bottleneck next to the model forward.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pero_pretraining_tpu.utils.lm import CharNgramLM
from pero_pretraining_tpu.utils.text import BLANK_ID, Charset

_NEG_INF = float("-inf")


def _logaddexp(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


class _Beam:
    __slots__ = ("p_blank", "p_nonblank", "lm_context")

    def __init__(self, lm_context: str = ""):
        self.p_blank = _NEG_INF  # mass of alignments ending in blank
        self.p_nonblank = _NEG_INF  # mass of alignments ending in the last char
        self.lm_context = lm_context

    def total(self) -> float:
        return _logaddexp(self.p_blank, self.p_nonblank)


def ctc_prefix_beam_search(
    log_probs: np.ndarray,
    beam_width: int = 16,
    blank: int = BLANK_ID,
    lm: Optional[CharNgramLM] = None,
    charset: Optional[Charset] = None,
    lm_weight: float = 0.5,
    insertion_bonus: float = 0.0,
    prune_chars: int = 16,
    prune_logp: float = -12.0,
) -> List[int]:
    """Decode one line. `log_probs` is (S, C) log-softmax frame posteriors
    (already restricted to real-content frames). Returns the best label
    sequence (blank/repeat collapsed). With `lm`, `charset` maps class ids to
    characters for LM context.
    """
    if lm is not None and charset is None:
        raise ValueError("LM fusion requires a charset to map class ids to characters")
    log_probs = np.asarray(log_probs, dtype=np.float64)
    num_classes = log_probs.shape[1]

    init_context = lm.initial_context() if lm is not None else ""
    root = _Beam(init_context)
    root.p_blank = 0.0
    beams: Dict[Tuple[int, ...], _Beam] = {(): root}

    # class id -> char once, for LM context updates
    id_to_char = (
        {i: charset.chars[i - 1] for i in range(1, num_classes) if i - 1 < len(charset.chars)}
        if charset is not None
        else {}
    )

    for frame in log_probs:
        # candidate non-blank chars for this frame: top-k above the floor
        order = np.argsort(frame)[::-1]
        candidates = [
            int(c) for c in order[:prune_chars] if c != blank and frame[c] > prune_logp
        ]
        lp_blank = float(frame[blank])

        next_beams: Dict[Tuple[int, ...], _Beam] = {}

        def get(prefix: Tuple[int, ...], lm_context: str) -> _Beam:
            beam = next_beams.get(prefix)
            if beam is None:
                beam = _Beam(lm_context)
                next_beams[prefix] = beam
            return beam

        for prefix, beam in beams.items():
            total = beam.total()
            last = prefix[-1] if prefix else None

            # stay on this prefix: emit blank ...
            stay = get(prefix, beam.lm_context)
            stay.p_blank = _logaddexp(stay.p_blank, total + lp_blank)
            # ... or repeat the last char (collapses, no new label)
            if last is not None:
                stay.p_nonblank = _logaddexp(
                    stay.p_nonblank, beam.p_nonblank + float(frame[last])
                )

            if not candidates:
                continue
            if lm is not None:
                chars = [id_to_char.get(c, "\x00") for c in candidates]
                lm_adds = lm_weight * lm.logp_all(beam.lm_context, chars) + insertion_bonus
            else:
                lm_adds = None

            for idx, c in enumerate(candidates):
                lp_c = float(frame[c])
                add = float(lm_adds[idx]) if lm_adds is not None else insertion_bonus
                # extending with the same char as last only legal after a blank
                mass = (beam.p_blank if c == last else total) + lp_c + add
                if mass == _NEG_INF:
                    continue
                new_prefix = prefix + (c,)
                new_context = (
                    lm.advance(beam.lm_context, id_to_char.get(c, "\x00"))
                    if lm is not None
                    else ""
                )
                ext = get(new_prefix, new_context)
                ext.p_nonblank = _logaddexp(ext.p_nonblank, mass)

        ranked = sorted(next_beams.items(), key=lambda kv: kv[1].total(), reverse=True)
        beams = dict(ranked[:beam_width])

    best = max(beams.items(), key=lambda kv: kv[1].total())
    return list(best[0])


def decode_batch(
    log_probs: np.ndarray,
    frame_masks: np.ndarray,
    charset: Charset,
    beam_width: int = 16,
    lm: Optional[CharNgramLM] = None,
    lm_weight: float = 0.5,
    insertion_bonus: float = 0.0,
    use_native: bool = True,
) -> List[str]:
    """Beam-decode a batch: (N, S, C) log posteriors + (N, S) real-frame masks
    -> list of strings. Frames with mask 0 (canvas padding) are dropped before
    the search, mirroring how greedy decode forces them to blank.

    By default the search runs in the native C++ library (threaded over
    lines, ~2 orders of magnitude faster; utils/native_beam.py) with this
    Python implementation as semantics oracle and fallback — tests assert
    they transcribe identically (tests/test_native_beam.py)."""
    if use_native:
        from pero_pretraining_tpu.utils import native_beam

        if native_beam.available():
            return native_beam.decode_batch_native(
                log_probs, frame_masks, charset,
                beam_width=beam_width, lm=lm, lm_weight=lm_weight,
                insertion_bonus=insertion_bonus,
            )
    out = []
    for row_lp, row_mask in zip(np.asarray(log_probs), np.asarray(frame_masks)):
        frames = row_lp[row_mask.astype(bool)]
        ids = ctc_prefix_beam_search(
            frames,
            beam_width=beam_width,
            lm=lm,
            charset=charset,
            lm_weight=lm_weight,
            insertion_bonus=insertion_bonus,
        )
        out.append(charset.decode(ids))
    return out
