"""Joint-embedding (VICReg) training parity vs torch: identical ported
weights, identical paired batches, curves must track."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
from pero_pretraining_tpu.data.synthetic import synthetic_paired_batch
from pero_pretraining_tpu.pipelines.joint import JointEmbeddingTask
from pero_pretraining_tpu.utils.torch_import import convert_vit_backbone, linear_params
from test_training_parity import BLOCKS, D, FF, H, HEADS, W, TorchMaskedViT

LR = 1e-3
STEPS = 15
HID = 96


class TorchJointModel(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchMaskedViT()
        del self.backbone.head  # backbone only
        self.fc0 = torch.nn.Linear(D, HID)
        self.fc1 = torch.nn.Linear(HID, HID)

    def encode(self, x):
        b = self.backbone
        x = b.conv_layer(x).squeeze(2).permute(2, 0, 1)
        x = b.intermediate_norm(x)
        x = x + b.pe[: x.size(0)]
        x = b.encoder_layers(x).permute(1, 0, 2)  # (N, S, D)
        return self.fc1(torch.relu(self.fc0(x)))

    def forward(self, x1, x2):
        return self.encode(x1), self.encode(x2)


def _torch_vicreg(x, y, im1, im2, sm1, sm2):
    inv_x = x[torch.tensor(sm1) == 1]
    inv_y = y[torch.tensor(sm2) == 1]
    invariance = torch.nn.functional.mse_loss(inv_x, inv_y)
    z = torch.cat([x[torch.tensor(im1) == 1], y[torch.tensor(im2) == 1]], dim=0)
    variance = torch.mean(torch.relu(1.0 - torch.sqrt(torch.var(z, dim=0) + 1e-5)))
    mean_z = torch.mean(z, dim=0)
    cov = ((z - mean_z).T @ (z - mean_z)) / (z.shape[0] - 1)
    n_ = cov.shape[0]
    off = cov.flatten()[:-1].view(n_ - 1, n_ + 1)[:, 1:].flatten()
    covariance = torch.sum(off**2) / z.shape[1]
    return variance + invariance + covariance


@pytest.mark.slow
def test_vicreg_training_curves_match_torch(rng):
    torch.manual_seed(0)
    ref = TorchJointModel()
    opt = torch.optim.Adam(ref.parameters(), lr=LR)

    batches = [synthetic_paired_batch(rng, batch_size=4, width=W) for _ in range(STEPS)]

    torch_losses = []
    for b in batches:
        opt.zero_grad()
        x1 = torch.tensor(b["images"].transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
        x2 = torch.tensor(b["images2"].transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
        o1, o2 = ref(x1, x2)
        loss = _torch_vicreg(o1, o2, b["image_masks"], b["image_masks2"], b["shift_masks"], b["shift_masks2"])
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # ours from the same init
    torch.manual_seed(0)
    init = TorchJointModel()
    backbone_cfg = BackboneConfig(
        type="vit", model_dim=D, num_heads=HEADS, num_blocks=BLOCKS, feedforward_dim=FF,
        max_len=4096, random_shift=False,
    )
    head_cfg = HeadConfig(type="mlp", in_features=D, hidden_dim=HID, num_layers=2)
    task = JointEmbeddingTask(backbone_cfg, head_cfg, TrainingConfig(), loss_type="vicreg")

    params = {
        "backbone": convert_vit_backbone(init.backbone.state_dict(), num_blocks=BLOCKS),
        "head": {
            "fc0": linear_params(init.fc0.weight, init.fc0.bias),
            "fc1": linear_params(init.fc1.weight, init.fc1.bias),
        },
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    tx = optax.adam(LR)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            return task.loss_fn(p, {}, batch, jax.random.PRNGKey(0), False)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    for b in batches:
        nb = {k: jnp.asarray(v) for k, v in b.items()}
        params, opt_state, loss = step(params, opt_state, nb)
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-3)
    diffs = np.abs(np.asarray(our_losses) - np.asarray(torch_losses))
    assert diffs.mean() < 1e-2, f"mean |Δloss| {diffs.mean():.5f}\nours:  {our_losses}\ntorch: {torch_losses}"
