"""Unit tests for the rendered-experiment staged CLI's pure logic
(tools/rendered_experiment.py): leg keys and objective-aware artifact paths."""

import importlib.util
import os
import sys
import types

import pytest

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "rendered_experiment.py")


@pytest.fixture(scope="module")
def tool():
    spec = importlib.util.spec_from_file_location("rendered_experiment", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(**kw):
    ns = types.SimpleNamespace(
        stage="finetune", mode="pretrained", objective="masked", budget=192, backbone="vit",
        backbone_lr_scale=1.0, finetune_iterations=10000, finetune_seed=None, out="/tmp/x",
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_leg_keys(tool):
    assert tool._leg_key(_args()) == "pretrained_192"
    assert tool._leg_key(_args(mode="scratch", budget=48)) == "scratch_48"
    assert tool._leg_key(_args(objective="masked_dn")) == "pretrained_masked_dn_192"
    assert tool._leg_key(_args(objective="vicreg", budget=48)) == "pretrained_vicreg_48"
    assert tool._leg_key(_args(backbone_lr_scale=0.1)) == "pretrained_192_bbs0.1"
    assert tool._leg_key(_args(finetune_iterations=2500)) == "pretrained_192_it2500"
    # scratch ignores objective/backbone-lr-scale (no pretrained checkpoint involved)
    assert tool._leg_key(_args(mode="scratch", objective="vicreg")) == "scratch_192"
    # multi-seed legs encode the fine-tune seed (default seed leaves keys unchanged)
    assert tool._leg_key(_args(finetune_seed=1)) == "pretrained_192_s1"
    assert tool._leg_key(_args(mode="scratch", finetune_seed=2, budget=48)) == "scratch_48_s2"
    # non-default backbones are tagged in keys for BOTH modes
    assert tool._leg_key(_args(backbone="vggt", objective="masked_dn")) == "pretrained_masked_dn_vggt_192"
    assert tool._leg_key(_args(backbone="vggt", mode="scratch")) == "scratch_vggt_192"


def test_objective_paths(tool):
    assert tool._paths(_args())["pretrained"].endswith("pretrained.msgpack")
    assert tool._paths(_args(objective="masked_dn"))["pretrained"].endswith("pretrained_masked_dn.msgpack")
    assert tool._paths(_args(objective="vicreg"))["pretrained"].endswith("pretrained_vicreg.msgpack")
    assert tool._paths(_args(objective="masked_dn", backbone="vggt"))["pretrained"].endswith(
        "pretrained_masked_dn_vggt.msgpack")
    assert tool._backbone_dict(_args(backbone="vggt"))["type"] == "vggt"


def test_update_summary_appends(tool, tmp_path):
    path = str(tmp_path / "summary.json")
    tool._update_summary(path, "a", {"cer": 0.5})
    tool._update_summary(path, "b", {"cer": 0.4})
    import json

    with open(path) as f:
        data = json.load(f)
    assert data == {"a": {"cer": 0.5}, "b": {"cer": 0.4}}


def test_summarize_parse_and_aggregate():
    """tools/summarize_rendered.py groups legs by (mode, budget) over seeds."""
    spec = importlib.util.spec_from_file_location(
        "summarize_rendered", os.path.join(os.path.dirname(_TOOL), "summarize_rendered.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    summary = {
        "config": {"anything": 1},
        "scratch_192_s0": {"cer": 0.30},
        "scratch_192_s1": {"cer": 0.34},
        "pretrained_masked_dn_192_s0": {"cer": 0.20},
        "pretrained_masked_dn_192_it20000_s1": {"cer": 0.22},
        "pretrained_masked_dn_192_s0_beam_lm": {"cer": 0.18},
        "pretrained_192_bbs0.1": {"cer": 0.9},  # bbs ablation rows are excluded
        "scratch_vggt_192_s0": {"cer": 0.33},
        "pretrained_masked_dn_vggt_192_s0": {"cer": 0.21},
    }
    legs = mod.parse(summary)
    assert legs[("scratch_vggt", 192)] == [(0, 0.33)]
    assert legs[("pretrained_masked_dn_vggt", 192)] == [(0, 0.21)]
    assert sorted(legs[("scratch", 192)]) == [(0, 0.30), (1, 0.34)]
    assert sorted(legs[("pretrained_masked_dn", 192)]) == [(0, 0.20), (1, 0.22)]
    assert legs[("pretrained_masked_dn +beam+LM", 192)] == [(0, 0.18)]
    assert not any("bbs" in m for m, _ in legs)
    assert mod.fmt([(0, 0.30), (1, 0.34)]) == "0.3200 ± 0.0200"
    assert mod.fmt([(0, 0.25)]) == "0.2500"
