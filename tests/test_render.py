"""Rendered-text corpus generation (data/render.py)."""

import numpy as np
import pytest

from pero_pretraining_tpu.data.render import (
    HEIGHT,
    build_corpus,
    corpus_charset,
    find_fonts,
    render_line,
    sample_text,
)


def test_find_fonts_present():
    fonts = find_fonts()
    assert fonts, "DejaVu fonts should be discoverable on this image"
    assert all(f.endswith(".ttf") for f in fonts)


def test_render_line_shape_and_determinism():
    fonts = find_fonts()
    img1 = render_line("Hello world 42", np.random.RandomState(7), fonts)
    img2 = render_line("Hello world 42", np.random.RandomState(7), fonts)
    assert img1.shape[0] == HEIGHT and img1.shape[2] == 3
    assert img1.dtype == np.uint8
    np.testing.assert_array_equal(img1, img2)
    # ink is darker than paper: the rendered line has real contrast
    assert int(img1.min()) < 128 < int(img1.max())


def test_render_line_max_width_crop():
    fonts = find_fonts()
    rng = np.random.RandomState(0)
    text = " ".join(sample_text(rng) for _ in range(10))
    img = render_line(text, rng, fonts, max_width=256)
    assert img.shape[1] <= 256


def test_find_fonts_excludes_nonprose_variants():
    for path in find_fonts():
        base = path.rsplit("/", 1)[-1]
        assert "Display" not in base and "Math" not in base


def test_sample_fitting_never_cropped():
    """fit-text sampling guarantees the rendered line fits max_width, so the
    stored transcription matches the visible pixels (no CTC label noise)."""
    from pero_pretraining_tpu.data.render import sample_fitting

    fonts = find_fonts()
    rng = np.random.RandomState(11)
    for _ in range(50):
        text, font_path, size = sample_fitting(rng, fonts, max_width=384)
        img = render_line(text, rng, fonts, max_width=384, font_path=font_path, size=size)
        assert img.shape[1] <= 384
        # un-cropped: the right edge is pure margin/paper (no ink columns lost)
        assert img[:, -1].min() > 100


def test_sample_text_charset_closure():
    charset = set(corpus_charset())
    rng = np.random.RandomState(3)
    for _ in range(200):
        text = sample_text(rng)
        assert set(text) <= charset, f"text {text!r} escapes corpus_charset()"


def test_build_corpus_roundtrip(tmp_path):
    from pero_pretraining_tpu.data.dataset import LinesDataset, TranscriptionDataset

    out = build_corpus(str(tmp_path), n_train=6, n_test=3, seed=1, max_width=384)
    ds = LinesDataset(out["store"], out["lines"]["trn"][0], max_width=384)
    assert len(ds) == 6
    item = ds[0]
    assert item["image"].shape[0] == HEIGHT
    assert item["image"].shape[1] <= 384

    tds = TranscriptionDataset(out["store"], out["lines"]["tst"][1], max_width=384)
    assert len(tds) == 3
    titem = tds[1]
    assert titem["text"] and isinstance(titem["text"], str)
    assert titem["image"].shape[0] == HEIGHT


def test_build_corpus_deterministic(tmp_path):
    a = build_corpus(str(tmp_path / "a"), n_train=3, n_test=1, seed=5)
    b = build_corpus(str(tmp_path / "b"), n_train=3, n_test=1, seed=5)
    with open(a["lines"]["trn"][1]) as f:
        ta = f.read()
    with open(b["lines"]["trn"][1]) as f:
        tb = f.read()
    assert ta == tb
