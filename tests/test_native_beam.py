"""Native C++ CTC prefix beam search (native/beam_decode.cpp) vs the Python
oracle (utils/ctc_decode.py).

The Python implementation is the semantics reference (itself verified against
exhaustive CTC enumeration in tests/test_ctc_decode.py); the native decoder
must transcribe identically — same pruning, same float64 probability math,
same stupid-backoff LM walk — across beam widths, LM settings, ragged masks,
and thread counts.
"""

import numpy as np
import pytest

from pero_pretraining_tpu.utils import native_beam
from pero_pretraining_tpu.utils.ctc_decode import decode_batch
from pero_pretraining_tpu.utils.lm import CharNgramLM
from pero_pretraining_tpu.utils.text import Charset

pytestmark = pytest.mark.skipif(not native_beam.available(), reason="native beam lib unavailable")

CHARS = [chr(ord("a") + i) for i in range(10)]
CHARSET = Charset(CHARS)


def _random_batch(rng, n=6, s=40, scale=3.0):
    c = len(CHARSET)
    logits = rng.randn(n, s, c) * scale
    log_probs = logits - np.log(np.sum(np.exp(logits), axis=-1, keepdims=True))
    masks = np.zeros((n, s), np.int32)
    for i in range(n):
        masks[i, : rng.randint(s // 2, s + 1)] = 1
    return log_probs.astype(np.float32), masks


def _lm(rng, n_texts=60):
    texts = ["".join(rng.choice(CHARS, size=rng.randint(5, 30))) for _ in range(n_texts)]
    return CharNgramLM(order=4).fit(texts)


@pytest.mark.parametrize("beam_width", [1, 4, 16])
def test_native_matches_python_no_lm(beam_width):
    rng = np.random.RandomState(beam_width)
    log_probs, masks = _random_batch(rng)
    py = decode_batch(log_probs, masks, CHARSET, beam_width=beam_width, use_native=False)
    nat = native_beam.decode_batch_native(log_probs, masks, CHARSET, beam_width=beam_width)
    assert nat == py


@pytest.mark.parametrize("lm_weight,bonus", [(0.5, 0.0), (0.4, 0.3), (1.0, -0.2)])
def test_native_matches_python_with_lm(lm_weight, bonus):
    rng = np.random.RandomState(int(lm_weight * 10))
    log_probs, masks = _random_batch(rng, n=5, s=48)
    lm = _lm(rng)
    py = decode_batch(
        log_probs, masks, CHARSET, beam_width=8, lm=lm,
        lm_weight=lm_weight, insertion_bonus=bonus, use_native=False,
    )
    nat = native_beam.decode_batch_native(
        log_probs, masks, CHARSET, beam_width=8, lm=lm,
        lm_weight=lm_weight, insertion_bonus=bonus,
    )
    assert nat == py


def test_native_threads_deterministic():
    """Per-line searches are independent: 1 thread == 4 threads, any order."""
    rng = np.random.RandomState(7)
    log_probs, masks = _random_batch(rng, n=9, s=32)
    lm = _lm(rng)
    kw = dict(beam_width=6, lm=lm, lm_weight=0.5)
    one = native_beam.decode_batch_native(log_probs, masks, CHARSET, num_threads=1, **kw)
    four = native_beam.decode_batch_native(log_probs, masks, CHARSET, num_threads=4, **kw)
    assert one == four


def test_decode_batch_default_routes_native():
    """decode_batch(use_native=True) must agree with the explicit oracle call
    (it either routed native or fell back — both must transcribe the same)."""
    rng = np.random.RandomState(11)
    log_probs, masks = _random_batch(rng, n=4)
    lm = _lm(rng)
    auto = decode_batch(log_probs, masks, CHARSET, beam_width=8, lm=lm, lm_weight=0.4)
    oracle = decode_batch(log_probs, masks, CHARSET, beam_width=8, lm=lm, lm_weight=0.4,
                          use_native=False)
    assert auto == oracle


def test_peaked_posteriors_roundtrip():
    """Near-one-hot posteriors: both decoders must recover the planted text."""
    rng = np.random.RandomState(3)
    text = "abcabc"
    ids = [CHARS.index(ch) + 1 for ch in text]
    s, c = 4 * len(ids), len(CHARSET)
    logits = np.full((s, c), -8.0)
    for i, cls in enumerate(ids):
        logits[4 * i, 0] = 8.0  # blank separates repeats
        logits[4 * i + 1, cls] = 8.0
        logits[4 * i + 2, cls] = 8.0
        logits[4 * i + 3, 0] = 8.0
    log_probs = logits - np.log(np.sum(np.exp(logits), axis=-1, keepdims=True))
    batch = log_probs[None].astype(np.float32)
    masks = np.ones((1, s), np.int32)
    assert native_beam.decode_batch_native(batch, masks, CHARSET, beam_width=4) == [text]
    assert decode_batch(batch, masks, CHARSET, beam_width=4, use_native=False) == [text]


def test_empty_and_full_masks():
    rng = np.random.RandomState(5)
    log_probs, masks = _random_batch(rng, n=3, s=16)
    masks[0, :] = 0  # fully padded line -> empty transcription
    py = decode_batch(log_probs, masks, CHARSET, beam_width=4, use_native=False)
    nat = native_beam.decode_batch_native(log_probs, masks, CHARSET, beam_width=4)
    assert nat == py
    assert nat[0] == ""
