"""Beam-search CTC decoding + n-gram LM fusion.

Gold standard for the search itself: exhaustive enumeration of all label
sequences scored with the exact CTC forward algorithm — an unpruned beam
search must pick the same argmax labeling.
"""

import itertools
import math

import numpy as np
import pytest

from pero_pretraining_tpu.utils.ctc_decode import ctc_prefix_beam_search, decode_batch
from pero_pretraining_tpu.utils.lm import CharNgramLM
from pero_pretraining_tpu.utils.text import Charset


def exact_ctc_logp(log_probs, labels, blank=0):
    """log P(labels | x): forward algorithm over the blank-extended sequence."""
    ext = [blank]
    for l in labels:
        ext.extend([l, blank])
    S, _ = log_probs.shape
    L = len(ext)
    alpha = np.full(L, -np.inf)
    alpha[0] = log_probs[0, ext[0]]
    if L > 1:
        alpha[1] = log_probs[0, ext[1]]
    for t in range(1, S):
        new = np.full(L, -np.inf)
        for s in range(L):
            mass = alpha[s]
            if s >= 1:
                mass = np.logaddexp(mass, alpha[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                mass = np.logaddexp(mass, alpha[s - 2])
            new[s] = mass + log_probs[t, ext[s]]
        alpha = new
    if L == 1:
        return alpha[0]
    return np.logaddexp(alpha[-1], alpha[-2])


def random_log_probs(rng, S, C):
    logits = rng.normal(size=(S, C))
    return logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_search_matches_exhaustive(seed):
    rng = np.random.default_rng(seed)
    S, C = 5, 3  # blank + 2 chars
    lp = random_log_probs(rng, S, C)

    best_labels, best_score = None, -np.inf
    for length in range(S + 1):
        for labels in itertools.product(range(1, C), repeat=length):
            # skip labelings that cannot fit in S frames (repeats need a blank)
            min_frames = length + sum(1 for a, b in zip(labels, labels[1:]) if a == b)
            if min_frames > S:
                continue
            score = exact_ctc_logp(lp, labels)
            if score > best_score:
                best_score, best_labels = score, list(labels)

    decoded = ctc_prefix_beam_search(
        lp, beam_width=10000, prune_chars=C, prune_logp=-1e9
    )
    assert decoded == best_labels


def test_beam_search_sharp_distribution_equals_greedy():
    # frames: a a blank b b -> "ab"; near-one-hot posteriors
    charset = Charset(["a", "b"])
    S, C = 5, 3
    lp = np.full((S, C), -20.0)
    path = [1, 1, 0, 2, 2]
    for t, c in enumerate(path):
        lp[t, c] = -1e-9
    decoded = ctc_prefix_beam_search(lp, beam_width=4)
    assert charset.decode(decoded) == "ab"


def test_beam_search_sums_over_alignments_beats_greedy():
    # Classic case where the greedy path is blank but the summed mass of a
    # label beats it: P(blank)=0.42 each frame, P(a)=0.58 split across paths.
    lp = np.log(np.array([[0.42, 0.58], [0.42, 0.58]]))
    # greedy path = [a, a] -> "a"; but P("") = 0.42*0.42 = 0.1764,
    # P("a") = sum of (a,a),(a,-),(-,a) = 0.58*0.58+2*0.58*0.42 = 0.8236
    decoded = ctc_prefix_beam_search(lp, beam_width=16, prune_chars=2, prune_logp=-1e9)
    assert decoded == [1]


def test_lm_fusion_steers_ambiguous_frame():
    corpus = ["the cat sat", "the hat", "that cat"] * 20
    lm = CharNgramLM(order=3).fit(corpus)
    charset = Charset(sorted(set("".join(corpus)) | {"z"}))

    def frame(char_probs):
        lp = np.full(len(charset), -15.0)
        for ch, p in char_probs.items():
            lp[charset.encode(ch)[0] if ch != "<b>" else 0] = math.log(p)
        return lp

    # acoustics slightly prefer "thz" over "the" on the last char
    frames = np.stack(
        [
            frame({"t": 0.95}),
            frame({"h": 0.95}),
            frame({"z": 0.50, "e": 0.45}),
        ]
    )
    no_lm = ctc_prefix_beam_search(frames, beam_width=8, charset=charset)
    assert charset.decode(no_lm) == "thz"
    with_lm = ctc_prefix_beam_search(
        frames, beam_width=8, lm=lm, charset=charset, lm_weight=0.8
    )
    assert charset.decode(with_lm) == "the"


def test_decode_batch_respects_frame_masks():
    charset = Charset(["a", "b"])
    C = 3
    lp = np.full((2, 4, C), -20.0)
    # line 0: frames 0-1 real ("a"), rest junk that would decode as "b"
    lp[0, 0, 1] = lp[0, 1, 1] = -1e-9
    lp[0, 2, 2] = lp[0, 3, 2] = -1e-9
    # line 1: all real, "ab"
    lp[1, 0, 1] = lp[1, 1, 0] = lp[1, 2, 2] = lp[1, 3, 2] = -1e-9
    masks = np.array([[1, 1, 0, 0], [1, 1, 1, 1]])
    texts = decode_batch(lp, masks, charset, beam_width=4)
    assert texts == ["a", "ab"]


def test_char_ngram_lm_counts_and_backoff():
    lm = CharNgramLM(order=3).fit(["abc", "abd"])
    ctx = lm.initial_context()
    ctx = lm.advance(ctx, "a")
    ctx = lm.advance(ctx, "b")
    # P(c|ab) = 1/2 exactly (seen bigram context)
    assert math.isclose(lm.logp(ctx, "c"), math.log(0.5))
    assert math.isclose(lm.logp(ctx, "d"), math.log(0.5))
    # unseen continuation backs off below any seen one
    assert lm.logp(ctx, "a") < lm.logp(ctx, "c")
    # vectorized scoring agrees with scalar
    batch = lm.logp_all(ctx, ["c", "d", "a"])
    for got, ch in zip(batch, ["c", "d", "a"]):
        assert math.isclose(got, lm.logp(ctx, ch))


def test_char_ngram_lm_roundtrip(tmp_path):
    lm = CharNgramLM(order=4).fit(["hello world", "hell no"])
    path = str(tmp_path / "lm.json")
    lm.save(path)
    loaded = CharNgramLM.load(path)
    for text in ["hello", "help", "world"]:
        assert math.isclose(loaded.sequence_logp(text), lm.sequence_logp(text))
