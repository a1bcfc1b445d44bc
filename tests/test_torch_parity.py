"""Full-forward numerical parity against torch models of the reference
architecture, with weights ported via utils/torch_import.

These are the strongest correctness tests in the suite: they validate the
patchify order, pre-LN-before-positions ordering, qkv packing, post-LN block
structure, and conv/BN conversion all at once.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pero_pretraining_tpu.configs import BackboneConfig
from pero_pretraining_tpu.models.transformer import VisionTransformerEncoder
from pero_pretraining_tpu.models.vgg import PeroVggEncoder
from pero_pretraining_tpu.utils.torch_import import convert_pero_vgg_encoder, convert_vit_backbone

D, HEADS, BLOCKS, FF, H, W = 64, 2, 2, 128, 40, 128


class TorchReferenceViT(torch.nn.Module):
    """The reference's ViT architecture from its published description
    (models/transformers.py:10-109): strided-conv patchify, LayerNorm, sincos
    positions, post-LN relu TransformerEncoder."""

    def __init__(self):
        super().__init__()
        self.conv_layer = torch.nn.Conv2d(3, D, kernel_size=(H, 8), stride=(H, 8))
        self.intermediate_norm = torch.nn.LayerNorm(D, eps=1e-5)
        layer = torch.nn.TransformerEncoderLayer(d_model=D, nhead=HEADS, dim_feedforward=FF, dropout=0.0)
        self.encoder_layers = torch.nn.TransformerEncoder(layer, num_layers=BLOCKS)

        max_len = 4096
        pe = torch.zeros(max_len, D)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, D, 2).float() * (-math.log(10000.0) / D))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0).transpose(0, 1))

    def forward(self, x):  # x: (N, C, H, W)
        x = self.conv_layer(x)  # (N, D, 1, S)
        x = x.squeeze(2).permute(2, 0, 1)  # (S, N, D)
        x = self.intermediate_norm(x)
        x = x + self.pe[: x.size(0)]
        x = self.encoder_layers(x)
        return x.permute(1, 0, 2)  # (N, S, D)


def test_vit_forward_parity(rng):
    torch.manual_seed(0)
    ref = TorchReferenceViT().eval()

    config = BackboneConfig(
        type="vit", model_dim=D, num_heads=HEADS, num_blocks=BLOCKS, feedforward_dim=FF, max_len=4096
    )
    model = VisionTransformerEncoder(config)
    params = convert_vit_backbone(ref.state_dict(), num_blocks=BLOCKS)

    x_nhwc = rng.rand(2, H, W, 3).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x_nhwc.transpose(0, 3, 1, 2))).numpy()

    out = model.apply({"params": params}, jnp.asarray(x_nhwc), train=False)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=2e-4)


class TorchPeroVggEncoder(torch.nn.Module):
    """The PERO production conv stack from its published channel plan
    (models/helpers.py:97-130 + aggregation at :163-167)."""

    def __init__(self, out_channels=96):
        super().__init__()
        from torch.nn import BatchNorm2d, Conv2d, Dropout, LeakyReLU, MaxPool2d, ReLU, Sequential

        self.blocks = Sequential(
            Conv2d(3, 64, 3, 1, 1), ReLU(), Conv2d(64, 64, 3, 1, 1), ReLU(), MaxPool2d(2, 2), Dropout(0.0),
            Conv2d(64, 128, 3, 1, 1), ReLU(), Conv2d(128, 128, 3, 1, 1), ReLU(), MaxPool2d(2, 2), Dropout(0.0),
            Conv2d(128, 256, 3, 1, 1), ReLU(), Conv2d(256, 256, 3, 1, 1), ReLU(), Conv2d(256, 256, 3, 1, 1), ReLU(),
            MaxPool2d(2, 2), Dropout(0.0),
            Sequential(Conv2d(256, 512, 3, 1, 1), LeakyReLU(0.01), Conv2d(512, 512, 3, 1, 1), LeakyReLU(0.01),
                       MaxPool2d((2, 1), (2, 1))),
            BatchNorm2d(512), Dropout(0.0),
        )
        self.aggregation = Sequential(Conv2d(512, out_channels, kernel_size=(2, 1)), LeakyReLU(0.01))

    def forward(self, x):
        x = self.blocks(x)
        return self.aggregation(x)


def test_pero_vgg_forward_parity(rng):
    torch.manual_seed(0)
    ref = TorchPeroVggEncoder(out_channels=96).eval()

    model = PeroVggEncoder(out_channels=96)
    params, stats = convert_pero_vgg_encoder(ref.state_dict())

    x_nhwc = rng.rand(2, H, W, 3).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x_nhwc.transpose(0, 3, 1, 2))).numpy()  # (N, C, 1, S)
    expected = expected.squeeze(2).transpose(0, 2, 1)  # (N, S, C)

    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = model.apply(variables, jnp.asarray(x_nhwc), train=False)  # (N, 1, S, C)
    out = np.asarray(out).squeeze(1)
    np.testing.assert_allclose(out, expected, rtol=1e-3, atol=2e-4)
