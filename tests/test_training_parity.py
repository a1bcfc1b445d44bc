"""Training-curve parity: starting from IDENTICAL weights (ported via
utils/torch_import) and feeding IDENTICAL batches, our jitted Adam train step
must track a torch reference-architecture training run step by step.

This validates the whole training stack at once: forward, masked-CE loss,
gradients through every layer, and the Adam update — the strongest
end-to-end parity evidence short of a full pretraining run.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
from pero_pretraining_tpu.pipelines.masked import MaskedTask
from pero_pretraining_tpu.utils.torch_import import convert_vit_backbone, linear_params

D, HEADS, BLOCKS, FF, H, W, V = 64, 2, 2, 128, 40, 128, 32
LR = 1e-3
STEPS = 25


class TorchMaskedViT(torch.nn.Module):
    """Reference-architecture masked model (models/transformers.py +
    masked_pretraining/model.py behavior), random positional shift disabled
    for determinism."""

    def __init__(self):
        super().__init__()
        import math

        self.conv_layer = torch.nn.Conv2d(3, D, kernel_size=(H, 8), stride=(H, 8))
        self.intermediate_norm = torch.nn.LayerNorm(D, eps=1e-5)
        layer = torch.nn.TransformerEncoderLayer(d_model=D, nhead=HEADS, dim_feedforward=FF, dropout=0.0)
        self.encoder_layers = torch.nn.TransformerEncoder(layer, num_layers=BLOCKS)
        self.head = torch.nn.Linear(D, V)

        pe = torch.zeros(4096, D)
        position = torch.arange(0, 4096, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, D, 2).float() * (-math.log(10000.0) / D))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1))

    def forward(self, x, mask=None):
        if mask is not None:
            # reference pixel-space noise masking (models/transformers.py:53-68):
            # masked patches replaced with the seed-42 noise tile
            tile = np.random.RandomState(42).rand(1, 3, H, 8)
            s = x.shape[3] // 8
            pattern = torch.tensor(np.tile(tile, (1, 1, 1, s)), dtype=torch.float32)
            pixel_mask = torch.tensor(np.repeat(mask, 8, axis=1))[:, None, None, :].expand(-1, 3, H, -1)
            x = torch.where(pixel_mask == 1, pattern.expand(x.shape[0], -1, -1, -1), x)
        x = self.conv_layer(x).squeeze(2).permute(2, 0, 1)  # (S, N, D)
        x = self.intermediate_norm(x)
        x = x + self.pe[: x.size(0)]
        x = self.encoder_layers(x)
        return self.head(x.permute(1, 0, 2))  # (N, S, V)


@pytest.mark.slow
def test_masked_training_curves_match_torch(rng):
    torch.manual_seed(0)
    ref = TorchMaskedViT()
    opt = torch.optim.Adam(ref.parameters(), lr=LR)

    # identical batches for both runs
    s = W // 8
    batches = []
    for _ in range(STEPS):
        images = rng.rand(4, H, W, 3).astype(np.float32)
        labels = rng.randint(0, V, size=(4, s)).astype(np.int32)
        mask = (rng.rand(4, s) < 0.4).astype(np.int32)
        mask[:, 0] = 1  # ensure nonempty
        batches.append((images, labels, mask))

    # ---- torch run -------------------------------------------------------
    torch_losses = []
    for images, labels, mask in batches:
        opt.zero_grad()
        logits = ref(torch.tensor(images.transpose(0, 3, 1, 2)), mask)
        m = torch.tensor(mask) == 1
        loss = torch.nn.functional.cross_entropy(logits[m], torch.tensor(labels, dtype=torch.long)[m])
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # ---- our run, from the SAME initial weights --------------------------
    backbone_cfg = BackboneConfig(
        type="vit", model_dim=D, num_heads=HEADS, num_blocks=BLOCKS, feedforward_dim=FF,
        max_len=4096, random_shift=False,
    )
    task = MaskedTask(backbone_cfg, HeadConfig(in_features=D, out_features=V), TrainingConfig())

    torch.manual_seed(0)
    init = TorchMaskedViT()  # identical init to `ref` before training
    params = {
        "backbone": convert_vit_backbone(init.state_dict(), num_blocks=BLOCKS),
        "head": {"linear": linear_params(init.head.weight, init.head.bias)},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    tx = optax.adam(LR)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, images, labels, mask):
        def loss_fn(p):
            losses = task.loss_fn(p, {}, {"images": images, "labels": labels, "mask": mask}, jax.random.PRNGKey(0), False)
            return losses[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    for images, labels, mask in batches:
        # task.loss_fn divides images by 255; feed pre-scaled values
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images * 255.0), jnp.asarray(labels), jnp.asarray(mask)
        )
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-4)
    # curves drift slowly through float differences; stay within 1% per-step
    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-2)
    # and the overall trajectory must agree tightly on average
    diffs = np.abs(np.asarray(our_losses) - np.asarray(torch_losses))
    assert diffs.mean() < 5e-3, f"mean |Δloss| {diffs.mean():.4f}\nours:  {our_losses}\ntorch: {torch_losses}"
