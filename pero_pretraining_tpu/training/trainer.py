"""Generic training harness.

The reference has three near-identical Trainer classes, one per pipeline
(reference: masked_pretraining/trainer.py:5-68 and copies). Here one generic
trainer drives any task that exposes:

    init_variables(rng, batch) -> flax variables dict ({'params': ..., ...})
    loss_fn(params, model_state, batch, rng, train) -> (loss, (new_model_state, metrics))

TPU design points:
- the whole step (mask sampling, forward, backward, Adam update) is ONE jitted
  donated program; nothing returns to the host but scalar metrics,
- batches are device_put with the leading dim sharded over the `data` mesh
  axis; GSPMD inserts the gradient all-reduce over ICI,
- per-step RNG is fold_in(base_key, step): deterministic, exactly resumable
  (the reference re-samples host numpy RNG with no saved state),
- no `empty_cache()`-per-iteration equivalent (reference trainer.py:41-42 is
  a GPU workaround; XLA's arena allocator needs no such thing).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Iterator, Optional

import jax
import optax
from jax.sharding import Mesh

from pero_pretraining_tpu.configs import TrainingConfig
from pero_pretraining_tpu.parallel.mesh import local_mesh
from pero_pretraining_tpu.parallel.sharding import param_shardings, replicated, shard_batch
from pero_pretraining_tpu.training.schedules import warmup_polynomial_schedule
from pero_pretraining_tpu.training.state import TrainState


class Trainer:
    def __init__(
        self,
        task,
        config: TrainingConfig,
        mesh: Optional[Mesh] = None,
        on_view_step: Optional[Callable] = None,
    ):
        self.task = task
        self.config = config
        self.mesh = mesh if mesh is not None else local_mesh()
        self.on_view_step = on_view_step

        self.schedule = warmup_polynomial_schedule(
            config.learning_rate, config.warmup_iterations, config.warmup_polynomial_order
        )
        self.tx = optax.adam(learning_rate=self.schedule)

        donate = (0,) if config.donate_state else ()
        self._train_step = jax.jit(self._step, donate_argnums=donate)

    # ------------------------------------------------------------------ setup
    def init_state(self, sample_batch: Any) -> TrainState:
        """Initialize params on host, place them sharded, init optimizer on
        device so moment tensors inherit the param shardings."""
        rng = jax.random.PRNGKey(self.config.seed)
        variables = self.task.init_variables(rng, sample_batch)
        variables = dict(variables)
        params = variables.pop("params")
        model_state = variables  # batch_stats / vq / ... (may be empty)

        shardings = param_shardings(params, self.mesh)
        params = jax.device_put(params, shardings)
        model_state = jax.device_put(model_state, replicated(self.mesh))
        opt_state = jax.jit(self.tx.init)(params)

        return TrainState.create(params, model_state, opt_state, self.config.seed)

    # ------------------------------------------------------------- train step
    def _step(self, state: TrainState, batch: Any):
        rng = state.step_rng()
        grad_fn = jax.value_and_grad(self.task.loss_fn, has_aux=True)
        (loss, (new_model_state, metrics)), grads = grad_fn(
            state.params, state.model_state, batch, rng, True
        )
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
        )
        metrics = dict(metrics)
        metrics.setdefault("loss", loss)
        return new_state, metrics

    def train_step(self, state: TrainState, host_batch: Any):
        batch = shard_batch(host_batch, self.mesh)
        return self._train_step(state, batch)

    def current_lr(self, state: TrainState) -> float:
        return float(self.schedule(state.step))

    # ------------------------------------------------------------------- loop
    def fit(
        self,
        state: TrainState,
        batches: Iterable[Any],
        start_iteration: Optional[int] = None,
        end_iteration: Optional[int] = None,
        view_step: Optional[int] = None,
    ) -> TrainState:
        """Iteration-driven loop mirroring the reference's
        (masked_pretraining/trainer.py:19-50): the data iterator is recycled on
        exhaustion; `on_view_step(iteration, state, elapsed, count, metrics)`
        fires every `view_step` iterations."""
        start = int(state.step) if start_iteration is None else start_iteration
        end = self.config.end_iteration if end_iteration is None else end_iteration
        view = self.config.view_step if view_step is None else view_step

        iterator: Iterator = iter(batches)
        t0 = time.time()
        count = 0
        metrics = {}

        for iteration in range(start, end):
            try:
                host_batch = next(iterator)
            except StopIteration:
                iterator = iter(batches)
                host_batch = next(iterator)

            state, metrics = self.train_step(state, host_batch)
            count += 1

            if view and (iteration + 1) % view == 0 and self.on_view_step is not None:
                # sync once per view step only
                metrics = {k: float(v) for k, v in metrics.items()}
                elapsed = time.time() - t0
                self.on_view_step(iteration + 1, state, elapsed, count, metrics)
                t0 = time.time()
                count = 0

        return state
