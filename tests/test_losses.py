"""Numerical parity tests for losses against torch reimplementations of the
reference formulas (reference: masked_pretraining/model.py:72-95,
joint_embedding_pretraining/losses.py). The torch code here re-derives the
published math with dynamic boolean gathers; our jax losses use static-shape
masked reductions — values must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pero_pretraining_tpu.data.synthetic import synthetic_masked_batch, synthetic_paired_batch
from pero_pretraining_tpu.losses.masked_ce import masked_cross_entropy
from pero_pretraining_tpu.losses.ntxent import ntxent_loss
from pero_pretraining_tpu.losses.vicreg import vicreg_loss


def _torch_masked_ce(logits, labels, mask, unmasked_weight=None):
    logits_t = torch.tensor(logits)
    labels_t = torch.tensor(labels, dtype=torch.long)
    mask_t = torch.tensor(mask)
    loss = torch.nn.functional.cross_entropy(logits_t[mask_t == 1], labels_t[mask_t == 1])
    if unmasked_weight is not None:
        um_out = logits_t[mask_t == 0]
        um_lab = labels_t[mask_t == 0]
        keep = um_lab >= 0
        loss = loss + unmasked_weight * torch.nn.functional.cross_entropy(um_out[keep], um_lab[keep])
    return float(loss)


def test_masked_ce_parity(rng):
    n, s, v = 4, 32, 50
    logits = rng.randn(n, s, v).astype(np.float32)
    labels = rng.randint(0, v, size=(n, s)).astype(np.int32)
    labels[rng.rand(n, s) < 0.3] = -1
    mask = ((rng.rand(n, s) < 0.4) & (labels >= 0)).astype(np.int32)

    ours = masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask))
    ref = _torch_masked_ce(logits, labels, mask)
    np.testing.assert_allclose(float(ours["loss"]), ref, rtol=1e-5)

    ours_w = masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), unmasked_weight=0.5)
    ref_w = _torch_masked_ce(logits, labels, mask, unmasked_weight=0.5)
    np.testing.assert_allclose(float(ours_w["loss"]), ref_w, rtol=1e-5)


def _torch_vicreg(x, y, im1, im2, sm1, sm2):
    """Reference VICReg (losses.py:13-47) with boolean gathers."""
    x_t, y_t = torch.tensor(x), torch.tensor(y)
    inv_x = x_t[torch.tensor(sm1) == 1]
    inv_y = y_t[torch.tensor(sm2) == 1]
    invariance = torch.nn.functional.mse_loss(inv_x, inv_y)

    zx = x_t[torch.tensor(im1) == 1]
    zy = y_t[torch.tensor(im2) == 1]
    z = torch.cat([zx, zy], dim=0)
    variance = torch.mean(torch.nn.functional.relu(1.0 - torch.sqrt(torch.var(z, dim=0) + 1e-5)))
    mean_z = torch.mean(z, dim=0)
    cov = ((z - mean_z).T @ (z - mean_z)) / (z.shape[0] - 1)
    n_, m_ = cov.shape
    off = cov.flatten()[:-1].view(n_ - 1, n_ + 1)[:, 1:].flatten()
    covariance = torch.sum(off**2) / z.shape[1]
    return {
        "loss": float(variance + invariance + covariance),
        "loss.variance": float(variance),
        "loss.invariance": float(invariance),
        "loss.covariance": float(covariance),
    }


def test_vicreg_parity(rng):
    batch = synthetic_paired_batch(rng, batch_size=4, width=256)
    s = batch["image_masks"].shape[1]
    d = 24
    x = rng.randn(4, s, d).astype(np.float32)
    y = rng.randn(4, s, d).astype(np.float32)

    ours = vicreg_loss(
        jnp.asarray(x),
        jnp.asarray(y),
        jnp.asarray(batch["image_masks"]),
        jnp.asarray(batch["image_masks2"]),
        jnp.asarray(batch["shift_masks"]),
        jnp.asarray(batch["shift_masks2"]),
        jnp.asarray(batch["shifts"]),
    )
    ref = _torch_vicreg(
        x, y, batch["image_masks"], batch["image_masks2"], batch["shift_masks"], batch["shift_masks2"]
    )
    for key in ref:
        # fp32 accumulation-order differences (matmul vs torch.var reduction)
        # show up around 1e-4 absolute on ~8k-row statistics
        np.testing.assert_allclose(float(ours[key]), ref[key], rtol=2e-3, atol=2e-4, err_msg=key)


def _torch_ntxent(x, y, sm1, sm2, temperature=0.1):
    """Reference NT-Xent (losses.py:56-83) minus its image-mask indexing bug:
    shift-mask==1 already restricts to shared REAL frames (value 2 marks
    shared padding), so the inner image-mask filter is the identity."""
    x_t = torch.nn.functional.normalize(torch.tensor(x), dim=-1)
    y_t = torch.nn.functional.normalize(torch.tensor(y), dim=-1)
    losses = []
    for i in range(x_t.shape[0]):
        lx = x_t[i][torch.tensor(sm1[i]) == 1]
        ly = y_t[i][torch.tensor(sm2[i]) == 1]
        sim = lx @ ly.T / temperature
        loss = -torch.log(torch.diag(torch.exp(sim)) / torch.sum(torch.exp(sim), dim=0))
        losses.append(loss.mean())
    return float(torch.stack(losses).mean())


def test_ntxent_parity(rng):
    batch = synthetic_paired_batch(rng, batch_size=4, width=256)
    s = batch["image_masks"].shape[1]
    d = 24
    x = rng.randn(4, s, d).astype(np.float32)
    y = rng.randn(4, s, d).astype(np.float32)

    ours = ntxent_loss(
        jnp.asarray(x),
        jnp.asarray(y),
        jnp.asarray(batch["image_masks"]),
        jnp.asarray(batch["image_masks2"]),
        jnp.asarray(batch["shift_masks"]),
        jnp.asarray(batch["shift_masks2"]),
        jnp.asarray(batch["shifts"]),
    )
    ref = _torch_ntxent(x, y, batch["shift_masks"], batch["shift_masks2"])
    # masked logsumexp vs the reference's raw exp-sum differ by fp32 rounding
    np.testing.assert_allclose(float(ours["loss"]), ref, rtol=1e-3, atol=1e-4)


def test_ntxent_selected_counts_align(rng):
    """The roll-based alignment must pair exactly the frames the reference's
    boolean gathers pair: counts of sm1==1 and sm2==1 agree per line."""
    batch = synthetic_paired_batch(rng, batch_size=8, width=512)
    n1 = (batch["shift_masks"] == 1).sum(axis=1)
    n2 = (batch["shift_masks2"] == 1).sum(axis=1)
    np.testing.assert_array_equal(n1, n2)
