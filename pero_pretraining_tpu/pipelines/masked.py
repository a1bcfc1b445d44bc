"""Masked label prediction pipeline (BERT-style patch masking).

Task model = backbone -> linear head over per-frame quantized labels
(reference: masked_pretraining/model.py:33-69). The per-step Bernoulli patch
mask — sampled on host numpy in the reference (batch_operator.py:27-32) — is
drawn on device inside the jitted step from the fold_in(step) key.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
from pero_pretraining_tpu.losses.masked_ce import masked_cross_entropy, masked_cross_entropy_fused
from pero_pretraining_tpu.models.heads import build_head
from pero_pretraining_tpu.models.moe import pop_router_aux
from pero_pretraining_tpu.models.transformer import build_backbone
from pero_pretraining_tpu.ops.masking import sample_patch_mask, sample_span_mask


class MaskedPretrainingModel(nn.Module):
    """backbone -> (N, S, D) frames -> head -> (N, S, V) logits."""

    backbone_config: BackboneConfig
    head_config: HeadConfig
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    mesh: Any = None

    def setup(self):
        self.backbone = build_backbone(
            self.backbone_config, dtype=self.dtype, attention_impl=self.attention_impl, mesh=self.mesh
        )
        self.head = build_head(self.head_config, dtype=self.dtype)

    def __call__(self, images, mask=None, *, train: bool = False):
        frames = self.backbone(images, mask, train=train)
        return self.head(frames, train=train)


class MaskedTask:
    """Task adapter for the generic Trainer."""

    def __init__(
        self,
        backbone_config: BackboneConfig,
        head_config: HeadConfig,
        training_config: TrainingConfig,
        attention_impl: str = "xla",
        mesh=None,
    ):
        self.backbone_config = backbone_config
        self.head_config = head_config
        self.training_config = training_config
        dtype = jnp.bfloat16 if training_config.bfloat16 else jnp.float32
        self.model = MaskedPretrainingModel(
            backbone_config, head_config, dtype=dtype, attention_impl=attention_impl, mesh=mesh
        )
        self.masking_prob = training_config.masking_prob
        self.masking_mode = training_config.masking_mode
        self.span_length = training_config.span_length
        self.unmasked_weight = training_config.unmasked_weight
        self.device_augment = training_config.device_augment
        # fused head+CE only applies to a linear head (ops/fused_ce.py)
        self.fused_ce = training_config.fused_ce and head_config.type == "linear"

    # Trainer protocol -------------------------------------------------------
    def init_variables(self, rng: jax.Array, batch: Dict[str, Any]):
        init_rng, pos_rng, drop_rng = jax.random.split(rng, 3)
        images = jnp.asarray(batch["images"][:1], dtype=jnp.float32) / 255.0
        # jit the init: eager tracing dispatches thousands of tiny ops, which
        # is pathological over a remote-device transport
        init = jax.jit(lambda rngs, x: self.model.init(rngs, x, train=False))
        variables = dict(init({"params": init_rng, "positions": pos_rng, "dropout": drop_rng}, images))
        variables.pop("aux", None)  # sown router stats are per-step, not state
        return variables

    def _sample_mask(self, rng, labels):
        if self.masking_mode == "span":
            return sample_span_mask(rng, labels, self.masking_prob, self.span_length)
        return sample_patch_mask(rng, labels, self.masking_prob)

    def _prepare(self, rng, batch):
        """Images (+ labels) ready for the model. With device_augment, the
        shift augmentation runs fused inside the jitted step
        (ops/preprocess.py); the host only left-aligns lines."""
        images = jnp.asarray(batch["images"])
        labels = batch.get("labels")
        if self.device_augment and "widths" in batch:
            from pero_pretraining_tpu.ops.preprocess import device_shift_augment

            images, labels, _ = device_shift_augment(rng, images, jnp.asarray(batch["widths"]), labels)
        return images.astype(jnp.float32) / 255.0, labels

    def _apply(self, params, model_state, images, mask, rng, train: bool, method=None):
        """Apply the full model, or a sub-path via flax's `method` (the
        fused-CE loss path applies the backbone alone)."""
        variables = {"params": params, **model_state}
        rngs = None
        if train:
            pos_rng, drop_rng = jax.random.split(rng)
            rngs = {"positions": pos_rng, "dropout": drop_rng}
        mutable = [k for k in model_state.keys()] if train else False
        if train and self.backbone_config.num_experts > 1:
            # MoE layers sow their load-balance loss into "aux" (models/moe.py)
            mutable = list(mutable or []) + ["aux"]
        if train and mutable:
            out, new_state = self.model.apply(
                variables, images, mask, train=True, rngs=rngs, mutable=mutable, method=method
            )
            return out, dict(new_state)
        out = self.model.apply(variables, images, mask, train=train, rngs=rngs, method=method)
        return out, model_state

    @staticmethod
    def _backbone_only(model, images, mask, train):
        return model.backbone(images, mask, train=train)

    def loss_fn(self, params, model_state, batch, rng, train: bool):
        mask_rng, shift_rng, model_rng = jax.random.split(rng, 3)
        images, labels = self._prepare(shift_rng, batch)
        mask = batch.get("mask")
        if mask is None:
            mask = self._sample_mask(mask_rng, labels)

        if self.fused_ce:
            frames, new_model_state = self._apply(
                params, model_state, images, mask, model_rng, train, method=self._backbone_only
            )
            dense = params["head"]["linear"]
            kernel = dense["kernel"].astype(frames.dtype)
            bias = dense["bias"].astype(frames.dtype)
            losses = masked_cross_entropy_fused(frames, kernel, bias, labels, mask, self.unmasked_weight)
        else:
            logits, new_model_state = self._apply(params, model_state, images, mask, model_rng, train)
            losses = masked_cross_entropy(logits, labels, mask, self.unmasked_weight)
        metrics = {k: v for k, v in losses.items()}
        loss = losses["loss"]
        router = pop_router_aux(new_model_state)
        if router is not None:
            loss = loss + self.backbone_config.router_aux_weight * router["router_aux"]
            metrics.update(router)
            metrics["loss"] = loss
        return loss, (new_model_state, metrics)

    # Evaluation -------------------------------------------------------------
    def eval_step(self, params, model_state, batch, rng, measured_errors=(1, 3, 10)):
        """Loss + top-k error counts over masked positions, all on device
        (the reference computes this on CPU in numpy — tester.py:70-113).

        Top-k membership uses the strict-rank rule: the label is in the top-k
        iff fewer than k logits are strictly greater than the label's logit
        (identical to argsort selection except on exact ties).
        """
        shift_rng, mask_rng = jax.random.split(rng)
        images, labels = self._prepare(shift_rng, batch)
        mask = batch.get("mask")
        if mask is None:
            mask = self._sample_mask(mask_rng, labels)

        logits, _ = self._apply(params, model_state, images, mask, rng, train=False)
        losses = masked_cross_entropy(logits, labels, mask, self.unmasked_weight)

        logits32 = logits.astype(jnp.float32)
        safe_labels = jnp.maximum(labels, 0)
        label_logit = jnp.take_along_axis(logits32, safe_labels[..., None], axis=-1)[..., 0]
        rank = jnp.sum(logits32 > label_logit[..., None], axis=-1)  # (N, S)
        masked = (mask == 1).astype(jnp.int32)
        counts = {f"errors_{k}": jnp.sum((rank >= k) * masked) for k in measured_errors}
        counts["length"] = jnp.sum(masked)
        return losses["loss"], counts
