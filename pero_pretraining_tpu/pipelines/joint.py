"""Joint-embedding pretraining (VICReg / NT-Xent) pipeline.

Two augmented/shifted views of each line go through ONE shared-weight
backbone + head (reference: joint_embedding_pretraining/model.py:33-60 — no
momentum branch); the loss aligns per-frame embeddings via the collation's
shift masks. TPU notes: both views are encoded in a single batched forward
(concatenated on the batch axis — one big matmul stream instead of two), and
the per-line shifts ride the batch into the fully-vectorized losses.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from pero_pretraining_tpu.configs import BackboneConfig, HeadConfig, TrainingConfig
from pero_pretraining_tpu.losses.ntxent import ntxent_loss
from pero_pretraining_tpu.losses.vicreg import vicreg_loss
from pero_pretraining_tpu.models.heads import build_head
from pero_pretraining_tpu.models.moe import pop_router_aux
from pero_pretraining_tpu.models.transformer import build_backbone


class JointEmbeddingModel(nn.Module):
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

    def __call__(self, images1, images2, *, train: bool = False):
        """Encode both views with shared weights in one fused forward."""
        n = images1.shape[0]
        stacked = jnp.concatenate([images1, images2], axis=0)
        frames = self.backbone(stacked, None, train=train)
        out = self.head(frames, train=train)
        return out[:n], out[n:]

    def encode_one(self, images, *, train: bool = False):
        """Single-view encode (used by the momentum-target variant)."""
        frames = self.backbone(images, None, train=train)
        return self.head(frames, train=train)


class JointEmbeddingTask:
    def __init__(
        self,
        backbone_config: BackboneConfig,
        head_config: HeadConfig,
        training_config: TrainingConfig,
        loss_type: str = "vicreg",
        attention_impl: str = "xla",
        momentum: float = 0.0,
        mesh=None,
    ):
        """momentum > 0 enables a BYOL-style TARGET branch: view 2 is encoded
        by an EMA copy of the weights (stop-gradient), updated after each
        optimizer step as target = m*target + (1-m)*online. The reference has
        no momentum branch (joint_embedding_pretraining/model.py:33-60 shares
        weights); this is the standard modern anti-collapse extension."""
        self.backbone_config = backbone_config
        self.head_config = head_config
        self.training_config = training_config
        if loss_type not in ("vicreg", "ntxent"):
            raise ValueError(f"Unknown loss type: {loss_type}")
        self.loss_type = loss_type
        self.momentum = momentum
        dtype = jnp.bfloat16 if training_config.bfloat16 else jnp.float32
        self.model = JointEmbeddingModel(
            backbone_config, head_config, dtype=dtype, attention_impl=attention_impl, mesh=mesh
        )

    def init_variables(self, rng: jax.Array, batch: Dict[str, Any]):
        init_rng, pos_rng, drop_rng = jax.random.split(rng, 3)
        images1 = jnp.asarray(batch["images"][:1], dtype=jnp.float32) / 255.0
        images2 = jnp.asarray(batch["images2"][:1], dtype=jnp.float32) / 255.0
        init = jax.jit(lambda rngs, x1, x2: self.model.init(rngs, x1, x2, train=False))
        variables = dict(init({"params": init_rng, "positions": pos_rng, "dropout": drop_rng}, images1, images2))
        variables.pop("aux", None)  # sown router stats are per-step, not state
        if self.momentum > 0:
            # target branch starts as an exact copy of the online weights —
            # a REAL copy: aliased buffers would be donated twice by the step
            variables["target_params"] = jax.tree_util.tree_map(jnp.copy, variables["params"])
        return variables

    def post_update(self, new_params, model_state):
        """Trainer hook (runs inside the jitted step, after the optimizer):
        EMA-update the target branch toward the new online weights."""
        if self.momentum <= 0 or "target_params" not in model_state:
            return model_state
        m = self.momentum
        new_target = jax.tree_util.tree_map(
            lambda t, p: m * t + (1.0 - m) * p, model_state["target_params"], new_params
        )
        return {**model_state, "target_params": new_target}

    def _split_state(self, model_state):
        collections = {k: v for k, v in model_state.items() if k != "target_params"}
        return collections, model_state.get("target_params")

    def _apply(self, params, model_state, images1, images2, rng, train: bool):
        collections, target_params = self._split_state(model_state)
        variables = {"params": params, **collections}
        rngs = None
        if train:
            pos_rng, drop_rng = jax.random.split(rng)
            rngs = {"positions": pos_rng, "dropout": drop_rng}

        if self.momentum > 0 and target_params is not None:
            # online branch on view 1 (with grads), frozen EMA target on view 2
            mutable = list(collections.keys()) if train else False
            if train and self.backbone_config.num_experts > 1:
                mutable = list(mutable or []) + ["aux"]  # MoE load-balance loss
            if train and mutable:
                out1, new_cols = self.model.apply(
                    variables, images1, train=True, rngs=rngs, mutable=mutable, method=self.model.encode_one
                )
                new_state = {**dict(new_cols), "target_params": target_params}
            else:
                out1 = self.model.apply(variables, images1, train=train, rngs=rngs, method=self.model.encode_one)
                new_state = model_state
            target_vars = {"params": target_params, **collections}
            out2 = self.model.apply(target_vars, images2, train=False, method=self.model.encode_one)
            return out1, jax.lax.stop_gradient(out2), new_state

        mutable = list(collections.keys()) if train else False
        if train and self.backbone_config.num_experts > 1:
            mutable = list(mutable or []) + ["aux"]  # MoE load-balance loss
        if train and mutable:
            (out1, out2), new_state = self.model.apply(
                variables, images1, images2, train=True, rngs=rngs, mutable=mutable
            )
            return out1, out2, dict(new_state)
        out1, out2 = self.model.apply(variables, images1, images2, train=train, rngs=rngs)
        return out1, out2, model_state

    def _loss(self, out1, out2, batch):
        args = (
            out1,
            out2,
            jnp.asarray(batch["image_masks"]),
            jnp.asarray(batch["image_masks2"]),
            jnp.asarray(batch["shift_masks"]),
            jnp.asarray(batch["shift_masks2"]),
            jnp.asarray(batch["shifts"]),
        )
        if self.loss_type == "vicreg":
            return vicreg_loss(*args)
        return ntxent_loss(*args)

    def loss_fn(self, params, model_state, batch, rng, train: bool):
        images1 = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        images2 = jnp.asarray(batch["images2"], dtype=jnp.float32) / 255.0
        out1, out2, new_model_state = self._apply(params, model_state, images1, images2, rng, train)
        losses = self._loss(out1, out2, batch)
        metrics = dict(losses)
        loss = losses["loss"]
        router = pop_router_aux(new_model_state)
        if router is not None:
            loss = loss + self.backbone_config.router_aux_weight * router["router_aux"]
            metrics.update(router)
            metrics["loss"] = loss
        return loss, (new_model_state, metrics)

    def eval_step(self, params, model_state, batch, rng):
        images1 = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        images2 = jnp.asarray(batch["images2"], dtype=jnp.float32) / 255.0
        out1, out2, _ = self._apply(params, model_state, images1, images2, rng, train=False)
        losses = self._loss(out1, out2, batch)
        return losses["loss"], {}
