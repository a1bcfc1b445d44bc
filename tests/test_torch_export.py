"""torch export (utils/torch_export): the inverse of torch_import.

Gold standard: export our params to a reference-layout state_dict, load it
into the torch reference architecture, and check full-forward parity —
proving models trained here deploy into the reference/PERO-OCR ecosystem.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pero_pretraining_tpu.configs import BackboneConfig
from pero_pretraining_tpu.models.transformer import VisionTransformerEncoder
from pero_pretraining_tpu.utils.torch_export import (
    export_masked_model,
    export_pero_vgg_encoder,
    export_vit_backbone,
)
from pero_pretraining_tpu.utils.torch_import import convert_pero_vgg_encoder, convert_vit_backbone

from tests.test_torch_parity import BLOCKS, D, FF, H, HEADS, W, TorchReferenceViT


def _init_vit_params(rng):
    config = BackboneConfig(type="vit", model_dim=D, num_heads=HEADS, num_blocks=BLOCKS, feedforward_dim=FF, max_len=4096)
    model = VisionTransformerEncoder(config)
    x = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0), "positions": jax.random.PRNGKey(1)}, x, train=False)
    return model, variables["params"]


def test_vit_export_forward_parity(rng):
    """Our randomly initialized ViT, exported to torch, must produce the same
    forward outputs in the torch reference architecture."""
    model, params = _init_vit_params(rng)
    sd = {k: torch.tensor(v) for k, v in export_vit_backbone(params, patch_size=(H, 8)).items()}

    ref = TorchReferenceViT().eval()
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(m == "pe" for m in missing), missing  # pe is generated, not stored

    x_nhwc = rng.rand(2, H, W, 3).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x_nhwc), train=False)
    with torch.no_grad():
        theirs = ref(torch.tensor(x_nhwc.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=2e-4)


def test_vit_export_import_roundtrip(rng):
    _, params = _init_vit_params(rng)
    sd = export_vit_backbone(params, patch_size=(H, 8))
    back = convert_vit_backbone(sd, num_blocks=BLOCKS)
    want = jax.tree_util.tree_leaves_with_path(params)
    got = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(back)}
    for key, value in want:
        np.testing.assert_allclose(got[jax.tree_util.keystr(key)], np.asarray(value), rtol=1e-6, atol=1e-7)


def test_pero_vgg_export_import_roundtrip(rng):
    """PeroVggEncoder params -> torch keys -> import -> identical tree (incl.
    BatchNorm running stats and the aggregation conv)."""
    from pero_pretraining_tpu.models.vgg import PeroVggEncoder

    model = PeroVggEncoder(out_channels=96)
    x = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    sd = export_pero_vgg_encoder(params, {"blocks_2d": stats["blocks_2d"]} if stats else None)
    back_params, back_stats = convert_pero_vgg_encoder(sd)

    flat_want = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(params)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(back_params)}
    assert set(flat_want) == set(flat_got), set(flat_want) ^ set(flat_got)
    for key in flat_want:
        np.testing.assert_allclose(flat_got[key], np.asarray(flat_want[key]), rtol=1e-6, atol=1e-7)
    if stats:
        flat_sw = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(stats)}
        flat_sg = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(back_stats)}
        for key in flat_sw:
            np.testing.assert_allclose(flat_sg[key], np.asarray(flat_sw[key]), rtol=1e-6, atol=1e-7)


def test_ctc_export_cli(rng, tmp_path, monkeypatch):
    """Fine-tuned CTC recognizer -> .pth with reference-style keys and a
    charset-sized head."""
    from flax import serialization

    from pero_pretraining_tpu.configs import TrainingConfig
    from pero_pretraining_tpu.pipelines.ctc import CTCTask
    from pero_pretraining_tpu.scripts.export_torch_checkpoint import main as export_main
    from pero_pretraining_tpu.utils.text import Charset

    charset = Charset(list("abc "))
    task = CTCTask(
        BackboneConfig(type="vit", model_dim=D, num_heads=HEADS, num_blocks=BLOCKS, feedforward_dim=FF, max_len=64),
        charset,
        TrainingConfig(seed=0),
    )
    batch = {"images": rng.randint(0, 255, (2, H, W, 3)).astype(np.uint8)}
    variables = task.init_variables(jax.random.PRNGKey(0), batch)

    ckpt = str(tmp_path / "ctc.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get({"params": variables["params"]})))

    out = str(tmp_path / "ctc.pth")
    monkeypatch.setattr(sys, "argv", ["export", "--input", ckpt, "--kind", "ctc_vit", "--output", out])
    assert export_main() == 0

    sd = torch.load(out, map_location="cpu")
    assert "backbone.conv_layer.weight" in sd
    assert sd["head.linear.weight"].shape == (len(charset), D)  # 4 chars + blank

    # forward parity: torch reference ViT + exported head == our CTCModel logits
    ref = TorchReferenceViT().eval()
    ref.load_state_dict({k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}, strict=False)
    head = torch.nn.Linear(D, len(charset))
    head.load_state_dict({"weight": sd["head.linear.weight"], "bias": sd["head.linear.bias"]})

    x_nhwc = rng.rand(2, H, W, 3).astype(np.float32)
    ours = task.model.apply({"params": variables["params"]}, jnp.asarray(x_nhwc), train=False)
    with torch.no_grad():
        theirs = head(ref(torch.tensor(x_nhwc.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=2e-4)


def test_export_cli_masked(rng, tmp_path, monkeypatch):
    """Full CLI: masked checkpoint -> .pth whose keys match the reference
    MaskedTransformerEncoder naming."""
    from flax import serialization

    from pero_pretraining_tpu.configs import HeadConfig, TrainingConfig
    from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.scripts.export_torch_checkpoint import main as export_main

    task = MaskedTask(
        BackboneConfig(type="vit", model_dim=D, num_heads=HEADS, num_blocks=BLOCKS, feedforward_dim=FF, max_len=64),
        HeadConfig(in_features=D, out_features=32),
        TrainingConfig(seed=0),
    )
    batch = synthetic_masked_batch(rng, batch_size=2, width=W, num_labels=32)
    variables = task.init_variables(jax.random.PRNGKey(0), batch)

    ckpt = str(tmp_path / "ckpt.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get({"params": variables["params"]})))

    out = str(tmp_path / "model.pth")
    monkeypatch.setattr(sys, "argv", ["export", "--input", ckpt, "--kind", "masked_vit", "--output", out])
    assert export_main() == 0

    sd = torch.load(out, map_location="cpu")
    assert "backbone.conv_layer.weight" in sd
    assert "head.linear.weight" in sd
    assert sd["head.linear.weight"].shape == (32, D)
    assert f"backbone.encoder_layers.layers.{BLOCKS - 1}.linear2.weight" in sd


def test_stacked_layout_export_matches_per_block(rng):
    """A stacked-blocks (pipeline-layout) checkpoint exports to the SAME
    reference state_dict as its per-block equivalent."""
    from pero_pretraining_tpu.parallel.pipeline import stack_block_params

    _, params = _init_vit_params(rng)
    sd_blocks = export_vit_backbone(params, patch_size=(H, 8))

    stacked = dict(params)
    blocks = [stacked.pop(f"block{i}") for i in range(BLOCKS)]
    stacked["stack"] = {"blocks": stack_block_params(blocks)}
    sd_stacked = export_vit_backbone(stacked, patch_size=(H, 8))

    assert set(sd_blocks) == set(sd_stacked)
    for key in sd_blocks:
        np.testing.assert_array_equal(sd_blocks[key], sd_stacked[key])
