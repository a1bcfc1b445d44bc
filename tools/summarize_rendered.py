"""Aggregate a rendered-experiment summary across fine-tune seeds.

Reads a rendered_summary.json produced by tools/rendered_experiment.py legs
(keys like ``scratch_192_it10000_s0``, ``pretrained_masked_dn_4000_it20000_s1``,
``..._beam_lm``) and prints a markdown table of CER per (mode, budget) with
mean +/- half-spread over seeds, plus the pretraining delta per budget.

Usage: python tools/summarize_rendered.py docs/demo/rendered50k/rendered_summary.json
"""

from __future__ import annotations

import json
import re
import sys
from collections import defaultdict

KEY_RE = re.compile(
    r"^(?P<mode>(?:scratch|pretrained)(?:_[a-z_]+?)?)(?:_ps(?P<pseed>\d+))?"
    r"(?:_(?P<ptag>(?:it|c)\d+k(?:_it\d+k)?))?_(?P<budget>\d+)"
    r"(?:_bbs(?P<bbs>[\d.]+))?(?:_it(?P<iters>\d+))?(?P<moments>_(?:bf16|i8)m)?(?:_s(?P<seed>\d+))?"
    r"(?P<beam>_beam_lm)?$"
)


def parse(summary: dict):
    legs = defaultdict(list)  # (mode, budget, beam) -> [(seed, cer)]
    for key, value in summary.items():
        if key == "config" or not isinstance(value, dict) or "cer" not in value:
            continue
        m = KEY_RE.match(key)
        if not m or m.group("bbs"):
            continue
        seed = int(m.group("seed") or 0)
        mode = m.group("mode")
        if m.group("pseed"):  # pretraining-seed robustness legs: own row
            mode += f" (pretrain seed {m.group('pseed')})"
        if m.group("ptag"):  # scaled pretrain budget: _it100k (iterations) /
            # _c100k (corpus lines) / _c100k_it100k (both axes)
            tag = m.group("ptag")
            if "_it" in tag:
                mode += f" ({tag.split('_')[0].lstrip('c')} corpus, {tag.split('_it')[1]} iters)"
            else:
                kind = "iters" if tag.startswith("it") else "corpus"
                mode += f" ({tag.lstrip('itc')} {kind})"
        if m.group("moments"):  # non-default Adam moment storage A/B legs
            mode += f" ({m.group('moments').strip('_')})"
        mode += " +beam+LM" if m.group("beam") else ""
        legs[(mode, int(m.group("budget")))].append((seed, float(value["cer"])))
    return legs


def fmt(cers):
    vals = [c for _, c in sorted(cers)]
    if len(vals) == 1:
        return f"{vals[0]:.4f}"
    mean = sum(vals) / len(vals)
    spread = (max(vals) - min(vals)) / 2
    return f"{mean:.4f} ± {spread:.4f}"


def main(path: str):
    with open(path) as f:
        summary = json.load(f)
    legs = parse(summary)
    budgets = sorted({b for _, b in legs})
    modes = sorted({m for m, _ in legs}, key=lambda m: (not m.startswith("scratch"), m))

    header = "| initialization | " + " | ".join(f"@{b} lines" for b in budgets) + " |"
    print(header)
    print("|" + "---|" * (len(budgets) + 1))
    for mode in modes:
        cells = [fmt(legs[(mode, b)]) if (mode, b) in legs else "—" for b in budgets]
        print(f"| {mode} | " + " | ".join(cells) + " |")

    # pretraining delta (greedy legs only): each pretrained mode vs the
    # scratch leg of the SAME backbone family (scratch vs scratch_vggt, ...)
    for mode, b in sorted(legs, key=lambda k: (k[1], k[0])):
        if not mode.startswith("pretrained") or "beam" in mode:
            continue
        tag = next((f"_{t}" for t in ("vggt",) if f"_{t}" in mode), "")
        sk = (f"scratch{tag}", b)
        if sk not in legs:
            continue
        s = [c for _, c in legs[sk]]
        p = [c for _, c in legs[(mode, b)]]
        delta = sum(s) / len(s) - sum(p) / len(p)
        noise = (max(s) - min(s)) / 2 + (max(p) - min(p)) / 2
        print(f"@{b}{tag}: pretraining delta {delta:+.4f} CER (seed half-spread sum {noise:.4f})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "docs/demo/rendered50k/rendered_summary.json")
