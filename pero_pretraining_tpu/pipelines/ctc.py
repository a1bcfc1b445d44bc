"""CTC fine-tuning: pretrained backbone -> character logits -> CTC loss/CER.

Closes the downstream-transfer loop the reference delegates to external
PERO-OCR code (reference README.md:9): load a pretrained backbone (masked or
joint-embedding checkpoint), put a fresh linear head over the charset
(+blank), train with CTC, and evaluate greedy-decode character error rate.

TPU notes: optax.ctc_loss runs fully batched on fixed shapes; frame paddings
come straight from the collation's image_masks; greedy decode is an argmax on
device with host-side collapse only for the decoded strings.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pero_pretraining_tpu.configs import BackboneConfig, TrainingConfig
from pero_pretraining_tpu.models.moe import pop_router_aux
from pero_pretraining_tpu.models.transformer import build_backbone
from pero_pretraining_tpu.utils.text import BLANK_ID, Charset, character_error_rate, collapse_ctc


class CTCModel(nn.Module):
    backbone_config: BackboneConfig
    num_classes: int  # charset size incl. blank
    dtype: Any = jnp.float32
    attention_impl: str = "xla"
    mesh: Any = None

    def setup(self):
        self.backbone = build_backbone(
            self.backbone_config, dtype=self.dtype, attention_impl=self.attention_impl, mesh=self.mesh
        )
        self.head = nn.Dense(self.num_classes, name="ctc_head", dtype=self.dtype)

    def __call__(self, images, *, train: bool = False):
        frames = self.backbone(images, None, train=train)  # (N, S, D)
        return self.head(frames)  # (N, S, num_classes)


class CTCTask:
    def __init__(
        self,
        backbone_config: BackboneConfig,
        charset: Charset,
        training_config: TrainingConfig,
        attention_impl: str = "xla",
        mesh=None,
    ):
        self.backbone_config = backbone_config
        self.charset = charset
        self.training_config = training_config
        dtype = jnp.bfloat16 if training_config.bfloat16 else jnp.float32
        self.model = CTCModel(
            backbone_config, num_classes=len(charset), dtype=dtype, attention_impl=attention_impl, mesh=mesh
        )

    # Trainer protocol -------------------------------------------------------
    def init_variables(self, rng: jax.Array, batch: Dict[str, Any]):
        init_rng, pos_rng, drop_rng = jax.random.split(rng, 3)
        images = jnp.asarray(batch["images"][:1], dtype=jnp.float32) / 255.0
        init = jax.jit(lambda rngs, x: self.model.init(rngs, x, train=False))
        variables = dict(init({"params": init_rng, "positions": pos_rng, "dropout": drop_rng}, images))
        variables.pop("aux", None)  # sown router stats are per-step, not state
        return variables

    @staticmethod
    def _match_block_layout(loaded_backbone: dict, target_backbone: dict) -> dict:
        """Auto-convert between the per-block (block0..L-1) and stacked
        ('stack/blocks', pipeline) encoder layouts when the pretraining
        checkpoint and the fine-tune config disagree — so a PP-pretrained
        backbone drops straight into a per-block fine-tune and vice versa
        (tools/convert_block_layout.py is the offline equivalent)."""
        from pero_pretraining_tpu.parallel.pipeline import stack_block_params, unstack_block_params

        loaded_stacked = "stack" in loaded_backbone
        target_stacked = "stack" in target_backbone
        if loaded_stacked == target_stacked:
            return loaded_backbone
        if loaded_stacked:  # stacked checkpoint -> per-block target
            stacked = loaded_backbone.pop("stack")["blocks"]
            num_blocks = jax.tree_util.tree_leaves(stacked)[0].shape[0]
            for i, block in enumerate(unstack_block_params(stacked, num_blocks)):
                loaded_backbone[f"block{i}"] = block
            return loaded_backbone
        # per-block checkpoint -> stacked target
        blocks = []
        while f"block{len(blocks)}" in loaded_backbone:
            blocks.append(loaded_backbone.pop(f"block{len(blocks)}"))
        loaded_backbone["stack"] = {"blocks": stack_block_params(blocks)}
        return loaded_backbone

    def load_pretrained_backbone(self, variables, checkpoint_path: str):
        """Graft the backbone subtree from a pretraining checkpoint (masked or
        joint-embedding; both store params under 'backbone')."""
        from pero_pretraining_tpu.scripts.common import load_checkpoint_tree, split_variables

        params, model_state = split_variables(load_checkpoint_tree(checkpoint_path))
        if "backbone" not in params:
            raise ValueError(f"checkpoint {checkpoint_path} has no 'backbone' params")
        variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
        new_params = dict(variables["params"])
        new_params["backbone"] = self._match_block_layout(
            dict(params["backbone"]), variables["params"]["backbone"]
        )
        out = {"params": new_params}
        for key, value in variables.items():
            if key != "params":
                out[key] = value
        # batch_stats (VggT) ride along when present in the checkpoint
        if "batch_stats" in model_state and "batch_stats" in out:
            bs = dict(out["batch_stats"])
            if "backbone" in model_state["batch_stats"]:
                bs["backbone"] = model_state["batch_stats"]["backbone"]
            out["batch_stats"] = bs
        return out

    def _apply(self, params, model_state, images, rng, train: bool):
        variables = {"params": params, **model_state}
        rngs = None
        if train:
            pos_rng, drop_rng = jax.random.split(rng)
            rngs = {"positions": pos_rng, "dropout": drop_rng}
        mutable = list(model_state.keys()) if train else False
        if train and self.backbone_config.num_experts > 1:
            mutable = list(mutable or []) + ["aux"]  # MoE load-balance loss
        if train and mutable:
            logits, new_state = self.model.apply(variables, images, train=True, rngs=rngs, mutable=mutable)
            return logits, dict(new_state)
        logits = self.model.apply(variables, images, train=train, rngs=rngs)
        return logits, model_state

    def _ctc_loss(self, logits, batch):
        # frames outside real content are padding for CTC
        logit_paddings = 1.0 - jnp.asarray(batch["image_masks"], jnp.float32)
        labels = jnp.asarray(batch["ctc_labels"])
        label_paddings = jnp.asarray(batch["ctc_label_paddings"], jnp.float32)
        per_seq = optax.ctc_loss(
            logits.astype(jnp.float32), logit_paddings, labels, label_paddings, blank_id=BLANK_ID
        )
        label_lengths = jnp.maximum(jnp.sum(1.0 - label_paddings, axis=-1), 1.0)
        return jnp.mean(per_seq / label_lengths)

    def loss_fn(self, params, model_state, batch, rng, train: bool):
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        logits, new_model_state = self._apply(params, model_state, images, rng, train)
        loss = self._ctc_loss(logits, batch)
        metrics = {"loss": loss}
        router = pop_router_aux(new_model_state)
        if router is not None:
            loss = loss + self.backbone_config.router_aux_weight * router["router_aux"]
            metrics.update(router)
            metrics["loss"] = loss
        return loss, (new_model_state, metrics)

    # Evaluation -------------------------------------------------------------
    def _eval_logits(self, params, model_state, batch, rng):
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        logits, _ = self._apply(params, model_state, images, rng, train=False)
        return logits, self._ctc_loss(logits, batch)

    def eval_step(self, params, model_state, batch, rng):
        logits, loss = self._eval_logits(params, model_state, batch, rng)
        # greedy path: argmax per frame; padding frames forced to blank
        path = jnp.argmax(logits.astype(jnp.float32), axis=-1)
        path = jnp.where(jnp.asarray(batch["image_masks"]) == 1, path, BLANK_ID)
        return loss, {"path": path}

    def eval_logprobs_step(self, params, model_state, batch, rng):
        """Like eval_step but returns full frame log-posteriors for beam search."""
        logits, loss = self._eval_logits(params, model_state, batch, rng)
        return loss, {"log_probs": jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)}

    def decode_paths(self, paths: np.ndarray) -> List[str]:
        return [self.charset.decode(collapse_ctc(row)) for row in np.asarray(paths)]


class CTCTester:
    """Loss + CER over a dataloader; greedy (default) or beam+LM decoding."""

    def __init__(
        self,
        task: CTCTask,
        dataloader,
        max_lines: Optional[int] = None,
        decoder: str = "greedy",
        beam_width: int = 16,
        lm=None,
        lm_weight: float = 0.5,
        insertion_bonus: float = 0.0,
    ):
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.task = task
        self.dataloader = dataloader
        self.max_lines = max_lines
        self.decoder = decoder
        self.beam_width = beam_width
        self.lm = lm
        self.lm_weight = lm_weight
        self.insertion_bonus = insertion_bonus
        self._eval = jax.jit(task.eval_step if decoder == "greedy" else task.eval_logprobs_step)

    def _decode(self, aux, batch) -> List[str]:
        if self.decoder == "greedy":
            return self.task.decode_paths(aux["path"])
        from pero_pretraining_tpu.utils.ctc_decode import decode_batch

        return decode_batch(
            np.asarray(aux["log_probs"]),
            np.asarray(batch["image_masks"]),
            self.task.charset,
            beam_width=self.beam_width,
            lm=self.lm,
            lm_weight=self.lm_weight,
            insertion_bonus=self.insertion_bonus,
        )

    def test(self, state) -> Dict[str, float]:
        from pero_pretraining_tpu.training.tester import numeric_batch

        total_loss, num_batches, num_lines = 0.0, 0, 0
        hypotheses: List[str] = []
        references: List[str] = []
        for batch in self.dataloader:
            loss, aux = self._eval(state.params, state.model_state, numeric_batch(batch), jax.random.PRNGKey(0))
            total_loss += float(loss)
            hypotheses.extend(self._decode(aux, batch))
            references.extend(batch["texts"])
            num_lines += batch["images"].shape[0]
            num_batches += 1
            if self.max_lines is not None and num_lines > self.max_lines:
                break
        return {
            "loss": total_loss / max(num_batches, 1),
            "cer": character_error_rate(hypotheses, references),
        }
