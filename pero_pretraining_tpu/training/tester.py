"""Held-out evaluation.

One generic Tester replaces the reference's three per-pipeline copies
(reference: masked_pretraining/tester.py:6-113 and siblings). It drives the
task's jitted `eval_step` over a dataloader and accumulates:

- mean loss over batches (reference averages per-batch losses, :46),
- any integer counters the task returns (the masked task returns top-k error
  counts over masked frames + their total, computed ON DEVICE; the reference
  does this on CPU numpy per batch, :70-113).

Evaluation masks are sampled deterministically from a fixed seed folded with
the batch index, so eval is reproducible across calls and across resumes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from pero_pretraining_tpu.training.state import TrainState

_NUMERIC_KEYS = (
    "images",
    "images2",
    "image_masks",
    "image_masks2",
    "shifts",
    "shift_masks",
    "shift_masks2",
    "labels",
    "mask",
    "widths",
    "ctc_labels",
    "ctc_label_paddings",
)


def numeric_batch(batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Strip non-array keys (ids, originals) so the batch is jit-traceable."""
    return {k: batch[k] for k in _NUMERIC_KEYS if k in batch}


class Tester:
    def __init__(self, task, dataloader, max_lines: Optional[int] = None, seed: int = 7):
        self.task = task
        self.dataloader = dataloader
        self.max_lines = max_lines
        self.seed = seed
        self._eval = jax.jit(task.eval_step)

    def test(self, state: TrainState) -> Dict[str, float]:
        total_loss = 0.0
        num_batches = 0
        num_lines = 0
        counters: Dict[str, int] = {}

        base_rng = jax.random.PRNGKey(self.seed)
        for i, batch in enumerate(self.dataloader):
            rng = jax.random.fold_in(base_rng, i)
            loss, counts = self._eval(state.params, state.model_state, numeric_batch(batch), rng)
            total_loss += float(loss)
            for key, value in counts.items():
                counters[key] = counters.get(key, 0) + int(value)
            num_lines += batch["images"].shape[0]
            num_batches += 1
            if self.max_lines is not None and num_lines > self.max_lines:
                break

        result: Dict[str, float] = {"loss": total_loss / max(num_batches, 1)}
        length = counters.pop("length", 0)
        for key, value in counters.items():
            result[key] = value / max(length, 1)
        return result
