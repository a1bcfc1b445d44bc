"""Rendered-text corpus generation (TrueType fonts via PIL).

The reference evaluates downstream transfer on real line-image datasets
(Bentham, historical print; paper arXiv:2405.00420 via reference README.md:3-9)
that are not redistributable with the code. This module synthesizes a
*printed-text analogue* entirely locally: text lines rendered at the canonical
40-px height with system TrueType fonts plus print-like degradations
(paper/ink level jitter, shear, blur, additive noise, JPEG artifacts), so the
full pretrain -> quantize -> masked-pretrain -> CTC-fine-tune -> CER loop runs
on a realistic, fully reproducible workload.

No counterpart exists in the reference (capability extension); output artifacts
use this framework's standard dataset formats (image KV store + lines/tsv
files), so every CLI and script consumes them unchanged.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

HEIGHT = 40

# Compact English lexicon (common words; enough character/shape diversity for
# OCR experiments — the text distribution only needs realistic glyph statistics).
LEXICON = (
    "the of and to in is was he for it with as his on be at by had not are but from or have an they which "
    "one you were her all she there would their we him been has when who will no more if out so said what "
    "up its about into than them can only other time new some could these two may first then do any like "
    "my now over such our man me even most made after also did many off before must well back through years "
    "where much your way down should because each just those people how too little state good very make "
    "world still see own men work long here get both between life being under never day same another know "
    "while last might us great old year come since against go came right used take three himself few house "
    "use during without again place around however home small found thought went say part once general high "
    "upon school every does got united left number course war until always away something fact though water "
    "less public put think almost hand enough far took head yet government system better set told nothing "
    "night end why called didn't eyes find going look asked later knew point next city business case give "
    "group toward young let days often order early face among moment side"
).split()

PUNCT_TAIL = [",", ".", ";", ":", "!", "?"]


def find_fonts(extra_dirs: Optional[Sequence[str]] = None) -> List[str]:
    """Locate usable TrueType text fonts (DejaVu family: present on this image
    both in /usr/share/fonts and inside matplotlib's mpl-data)."""
    candidates: List[str] = []
    search = ["/usr/share/fonts"]
    if extra_dirs:
        search.extend(extra_dirs)
    try:
        import matplotlib

        search.append(os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data", "fonts", "ttf"))
    except ImportError:  # pragma: no cover
        pass
    for root in search:
        candidates.extend(glob.glob(os.path.join(root, "**", "DejaVu*.ttf"), recursive=True))
    # drop duplicates by basename (the same family ships in several places) and
    # the non-prose variants: "Display" (zero-height text bboxes) and "Math"
    # (DejaVuMathTeXGyre: unusual glyph metrics, not prose)
    seen: Dict[str, str] = {}
    for path in sorted(candidates):
        base = os.path.basename(path)
        if "Display" in base or "Math" in base:
            continue
        seen.setdefault(base, path)
    return sorted(seen.values())


def corpus_charset() -> List[str]:
    chars = set(" ")
    for w in LEXICON:
        chars.update(w)
    chars.update(PUNCT_TAIL)
    chars.update("0123456789")
    chars.update(c.upper() for c in "abcdefghijklmnopqrstuvwxyz")
    return sorted(chars)


def sample_text(rng: np.random.RandomState, min_words: int = 3, max_words: int = 9) -> str:
    """Sample a pseudo-sentence: lexicon words, occasional capitalization,
    digits, and trailing punctuation."""
    n = rng.randint(min_words, max_words + 1)
    words = [LEXICON[rng.randint(len(LEXICON))] for _ in range(n)]
    if rng.rand() < 0.8:
        words[0] = words[0].capitalize()
    if rng.rand() < 0.15:
        pos = rng.randint(len(words))
        words[pos] = str(rng.randint(0, 10000))
    text = " ".join(words)
    if rng.rand() < 0.6:
        text += PUNCT_TAIL[rng.randint(len(PUNCT_TAIL))]
    return text


MAX_MARGIN = 12


def sample_fitting(
    rng: np.random.RandomState,
    fonts: Sequence[str],
    max_width: int,
    min_words: int = 3,
    max_words: int = 9,
) -> Tuple[str, str, int]:
    """Sample (text, font_path, size) whose rendered width is guaranteed to fit
    `max_width` (including worst-case margins), so the stored transcription
    matches the visible pixels exactly. Without this, long lines get
    image-cropped at max_width while keeping the FULL text as CTC target —
    systematic label noise that floors the achievable CER."""
    from PIL import ImageFont

    budget = max_width - 2 * MAX_MARGIN
    words = max_words
    for _ in range(100):
        text = sample_text(rng, min_words=min_words, max_words=words)
        font_path = fonts[rng.randint(len(fonts))]
        size = rng.randint(22, 33)
        font = ImageFont.truetype(font_path, size)
        left, _, right, _ = font.getbbox(text)
        if right - left <= budget:
            return text, font_path, size
        words = max(min_words, words - 1)  # shrink until something fits
    # pathological font set (every variant too wide even at min_words):
    # truncate the last sampled text word-by-word to the measured budget so
    # corpus generation always terminates; the stored transcription still
    # matches the visible pixels exactly
    parts = text.split(" ")
    while len(parts) > 1:
        parts = parts[:-1]
        text = " ".join(parts)
        left, _, right, _ = font.getbbox(text)
        if right - left <= budget:
            return text, font_path, size
    while len(text) > 1:
        text = text[:-1]
        left, _, right, _ = font.getbbox(text)
        if right - left <= budget:
            break
    return text, font_path, size


def render_line(
    text: str,
    rng: np.random.RandomState,
    fonts: Sequence[str],
    height: int = HEIGHT,
    max_width: Optional[int] = None,
    font_path: Optional[str] = None,
    size: Optional[int] = None,
) -> np.ndarray:
    """Render one text line -> (height, W, 3) uint8 BGR with print-like
    degradations. W varies with the text and font (multiple of 1 px; callers
    crop/pad downstream as with any dataset image). Pass `font_path`/`size`
    (e.g. from sample_fitting) to control the glyph geometry; by default both
    are sampled here."""
    from PIL import Image, ImageDraw, ImageFilter, ImageFont

    if font_path is None:
        font_path = fonts[rng.randint(len(fonts))]
    if size is None:
        size = rng.randint(22, 33)
    font = ImageFont.truetype(font_path, size)

    left, top, right, bottom = font.getbbox(text)
    text_w = max(right - left, 8)
    text_h = max(bottom - top, 1)
    margin = rng.randint(2, 12)

    paper = rng.randint(200, 256)
    ink = rng.randint(0, 70)
    canvas_w = text_w + 2 * margin
    img = Image.new("L", (canvas_w, height), color=paper)
    draw = ImageDraw.Draw(img)
    max_y = max(height - text_h, 1)
    y = rng.randint(0, max_y) - top
    draw.text((margin - left, y), text, fill=ink, font=font)

    # slight shear (print skew)
    if rng.rand() < 0.5:
        shear = rng.uniform(-0.08, 0.08)
        img = img.transform(
            (canvas_w, height), Image.AFFINE, (1.0, shear, -shear * height / 2, 0.0, 1.0, 0.0), fillcolor=paper
        )
    # blur (defocus / ink bleed)
    if rng.rand() < 0.7:
        img = img.filter(ImageFilter.GaussianBlur(radius=rng.uniform(0.0, 0.9)))

    arr = np.asarray(img, dtype=np.float32)
    # additive sensor/paper noise
    arr = arr + rng.randn(*arr.shape) * rng.uniform(2.0, 9.0)
    arr = np.clip(arr, 0, 255).astype(np.uint8)
    arr = np.stack([arr] * 3, axis=-1)  # grayscale print -> 3-channel BGR
    if max_width is not None:
        arr = arr[:, :max_width]
    return arr


def build_corpus(
    out_dir: str,
    n_train: int,
    n_test: int,
    seed: int = 0,
    max_width: int = 512,
    jpeg_quality: Tuple[int, int] = (60, 95),
    store_name: str = "images.sqlite",
    fit_text: bool = True,
) -> Dict[str, object]:
    """Render a corpus and write it in the framework's dataset formats.

    Produces in `out_dir`:
    - `images.sqlite` — image KV store (JPEG-encoded lines),
    - `{trn,tst}.lines` — image-id lists (pretraining input),
    - `{trn,tst}.tsv`  — `"<id>\\t<text>"` transcriptions (CTC fine-tuning).

    `fit_text=True` (default) samples text/font/size jointly so every line fits
    `max_width` un-cropped and the transcription matches the pixels exactly;
    `fit_text=False` reproduces the legacy behavior (image cropped at
    max_width, full text kept — label noise on long lines).

    Returns {"store": path, "lines": {split: (lines_path, tsv_path)},
    "charset": [chars]}.
    """
    from pero_pretraining_tpu.data.dataset import encode_image
    from pero_pretraining_tpu.data.storage import SqliteStore

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    fonts = find_fonts()
    if not fonts:
        raise RuntimeError("no TrueType fonts found (looked for DejaVu*.ttf)")

    store_path = os.path.join(out_dir, store_name)
    if os.path.exists(store_path):
        os.remove(store_path)
    store = SqliteStore(store_path, readonly=False)
    lines: Dict[str, Tuple[str, str]] = {}
    for split, count in (("trn", n_train), ("tst", n_test)):
        ids, texts = [], []
        for i in range(count):
            if fit_text:
                text, font_path, size = sample_fitting(rng, fonts, max_width)
                img = render_line(text, rng, fonts, max_width=max_width, font_path=font_path, size=size)
            else:
                text = sample_text(rng)
                img = render_line(text, rng, fonts, max_width=max_width)
            image_id = f"{split}_{i:06d}.jpg"
            quality = int(rng.randint(jpeg_quality[0], jpeg_quality[1] + 1))
            ids.append(image_id)
            texts.append(text)
            store.put(image_id, encode_image(img, ".jpg", quality=quality))
        lines_path = os.path.join(out_dir, f"{split}.lines")
        with open(lines_path, "w") as f:
            f.writelines(i + "\n" for i in ids)
        tsv_path = os.path.join(out_dir, f"{split}.tsv")
        with open(tsv_path, "w") as f:
            f.writelines(f"{i}\t{t}\n" for i, t in zip(ids, texts))
        lines[split] = (lines_path, tsv_path)
    store.commit()
    store.close()
    return {"store": store_path, "lines": lines, "charset": corpus_charset()}
