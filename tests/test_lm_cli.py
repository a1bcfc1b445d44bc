"""fit_char_lm CLI -> LM artifact -> loadable and sane."""

import math
import sys


def test_fit_char_lm_cli(tmp_path, monkeypatch):
    from pero_pretraining_tpu.scripts.fit_char_lm import main
    from pero_pretraining_tpu.utils.lm import CharNgramLM

    tsv = str(tmp_path / "trn.tsv")
    with open(tsv, "w") as f:
        for i, text in enumerate(["the cat", "the hat", "that cat"] * 5):
            f.write(f"line_{i:03d}\t{text}\n")
    out = str(tmp_path / "lm.json")
    monkeypatch.setattr(sys, "argv", ["fit_char_lm", "--transcriptions", tsv, "--order", "4", "--output", out])
    assert main() == 0

    lm = CharNgramLM.load(out)
    assert lm.order == 4
    # in-domain text scores higher than shuffled junk
    assert lm.sequence_logp("the cat") > lm.sequence_logp("tcq hea")
    assert math.isfinite(lm.sequence_logp("zzz"))  # OOV chars hit the unigram floor


def test_fit_char_lm_plain_text(tmp_path, monkeypatch):
    from pero_pretraining_tpu.scripts.fit_char_lm import main
    from pero_pretraining_tpu.utils.lm import CharNgramLM

    txt = str(tmp_path / "corpus.txt")
    with open(txt, "w") as f:
        f.write("hello world\nhello there\n")
    out = str(tmp_path / "lm.json")
    monkeypatch.setattr(
        sys, "argv", ["fit_char_lm", "--transcriptions", txt, "--plain-text", "--order", "3", "--output", out]
    )
    assert main() == 0
    lm = CharNgramLM.load(out)
    assert "h" in lm.vocab and "\t" not in "".join(lm.vocab)
