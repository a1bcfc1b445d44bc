"""Extended training-curve parity: 300 Adam steps of masked pretraining, our
framework vs a torch model of the reference architecture, from identical
ported weights on identical batches. Writes docs/parity_curves.json and (when
matplotlib is present) docs/parity_curves.png.

Run on CPU for determinism:
    JAX_PLATFORMS=cpu python tools/parity_curves.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

STEPS = 300


def main():
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from test_training_parity import BLOCKS, D, FF, H, HEADS, LR, V, W, TorchMaskedViT
    from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
    from pero_pretraining_tpu.pipelines.masked import MaskedTask
    from pero_pretraining_tpu.utils.torch_import import convert_vit_backbone, linear_params

    rng = np.random.RandomState(7)
    s = W // 8
    batches = []
    for _ in range(STEPS):
        images = rng.rand(8, H, W, 3).astype(np.float32)
        labels = rng.randint(0, V, size=(8, s)).astype(np.int32)
        mask = (rng.rand(8, s) < 0.3).astype(np.int32)
        mask[:, 0] = 1
        batches.append((images, labels, mask))

    # torch run
    torch.manual_seed(0)
    ref = TorchMaskedViT()
    opt = torch.optim.Adam(ref.parameters(), lr=LR)
    torch_losses = []
    for images, labels, mask in batches:
        opt.zero_grad()
        logits = ref(torch.tensor(images.transpose(0, 3, 1, 2)), mask)
        m = torch.tensor(mask) == 1
        loss = torch.nn.functional.cross_entropy(logits[m], torch.tensor(labels, dtype=torch.long)[m])
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # our run from the same init
    backbone_cfg = BackboneConfig(
        type="vit", model_dim=D, num_heads=HEADS, num_blocks=BLOCKS, feedforward_dim=FF,
        max_len=4096, random_shift=False,
    )
    task = MaskedTask(backbone_cfg, HeadConfig(in_features=D, out_features=V), TrainingConfig())
    torch.manual_seed(0)
    init = TorchMaskedViT()
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
            return task.loss_fn(p, {}, {"images": images, "labels": labels, "mask": mask}, jax.random.PRNGKey(0), False)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    for images, labels, mask in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images * 255.0), jnp.asarray(labels), jnp.asarray(mask)
        )
        our_losses.append(float(loss))

    diffs = np.abs(np.asarray(our_losses) - np.asarray(torch_losses))
    summary = {
        "steps": STEPS,
        "mean_abs_diff": float(diffs.mean()),
        "max_abs_diff": float(diffs.max()),
        "final_ours": our_losses[-1],
        "final_torch": torch_losses[-1],
        "ours": our_losses,
        "torch": torch_losses,
    }
    docs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs")
    os.makedirs(docs, exist_ok=True)
    with open(os.path.join(docs, "parity_curves.json"), "w") as f:
        json.dump(summary, f)
    print(f"mean |Δloss| = {summary['mean_abs_diff']:.5f}, max = {summary['max_abs_diff']:.5f}")
    print(f"final: ours {our_losses[-1]:.4f} vs torch {torch_losses[-1]:.4f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
        ax1.plot(torch_losses, label="torch reference arch", lw=1.2)
        ax1.plot(our_losses, label="pero_pretraining_tpu", lw=1.2, ls="--")
        ax1.set_xlabel("step"); ax1.set_ylabel("masked CE loss"); ax1.legend(); ax1.set_title("Training curves (same init, same batches)")
        ax2.plot(diffs, lw=0.8)
        ax2.set_xlabel("step"); ax2.set_ylabel("|loss difference|"); ax2.set_yscale("log"); ax2.set_title("Per-step absolute difference")
        fig.tight_layout()
        fig.savefig(os.path.join(docs, "parity_curves.png"), dpi=110)
        print("wrote docs/parity_curves.png")
    except ImportError:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
