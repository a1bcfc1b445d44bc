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
from typing import Any, Callable, Iterable, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from pero_pretraining_tpu.configs import TrainingConfig
from pero_pretraining_tpu.parallel.mesh import local_mesh
from pero_pretraining_tpu.parallel.sharding import (
    fsdp_param_shardings,
    opt_state_shardings_like_params,
    param_shardings,
    replicated,
    shard_batch,
    shard_batch_leading,
    zero1_opt_state_shardings,
)
from pero_pretraining_tpu.training.schedules import build_schedule
from pero_pretraining_tpu.training.state import TrainState


def scale_by_adam_lowmem(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, moments_dtype=jnp.bfloat16
) -> optax.GradientTransformation:
    """Adam moment tracking with LOW-PRECISION moment STORAGE (compute stays
    fp32). The flagship trace (docs/flagship_trace_components.json) shows the
    fused Adam update at 34.5% of the step running exactly at HBM roofline —
    the only lever is moving fewer bytes, and m/v are half the optimizer
    state. Numerics: bf16 moments carry ~8 mantissa bits; update direction
    error is O(0.4%) — opt-in via --moments-dtype bfloat16."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moments_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        f32 = lambda x: x.astype(jnp.float32)
        mu = jax.tree_util.tree_map(lambda m, g: b1 * f32(m) + (1 - b1) * f32(g), state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * f32(v) + (1 - b2) * jnp.square(f32(g)), state.nu, grads)
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda m, v, g: ((m / c1) / (jnp.sqrt(v / c2) + eps)).astype(g.dtype), mu, nu, grads
        )
        cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(moments_dtype), t)
        return updates, optax.ScaleByAdamState(count=count, mu=cast(mu), nu=cast(nu))

    return optax.GradientTransformation(init, update)


class ScaleByAdam8bitState(NamedTuple):
    """Blockwise 8-bit Adam moment state. `mu_q`/`nu_q` are trees of
    param-SHAPED int8/uint8 tensors (so the ZeRO-1/FSDP path-suffix sharding
    match applies to them unchanged); `mu_scale`/`nu_scale` hold one fp32
    absmax per block of the trailing axis (~1/block_size the elements —
    replicated placement is fine)."""

    count: Any
    mu_q: Any
    mu_scale: Any
    nu_q: Any
    nu_scale: Any


def _q8_block(shape, block: int = 256) -> int:
    """Quantization block along the trailing axis: largest of {256,128} that
    divides it, else the whole axis (always valid). Static per leaf."""
    last = shape[-1] if shape else 1
    for b in (block, 128):
        if last % b == 0 and last >= b:
            return b
    return last


def _q8_encode(x, unsigned: bool, block: int = 256):
    """fp32 tensor -> (q8 same-shape, per-block absmax scales).

    Symmetric linear quantization per block of the trailing axis: int8
    levels [-127,127] (signed, first moment) or uint8 [0,255] (nonnegative,
    sqrt-second-moment). All-zero blocks encode exactly (scale kept, q=0)."""
    b = _q8_block(x.shape, block)
    xb = x.reshape(x.shape[:-1] + (x.shape[-1] // b, b))
    scale = jnp.max(jnp.abs(xb), axis=-1)
    safe = jnp.where(scale > 0, scale, 1.0)
    levels, dtype = (255.0, jnp.uint8) if unsigned else (127.0, jnp.int8)
    q = jnp.round(xb / safe[..., None] * levels)
    q = jnp.clip(q, 0.0 if unsigned else -levels, levels).astype(dtype)
    return q.reshape(x.shape), scale


def _q8_decode(q, scale, unsigned: bool, block: int = 256):
    b = _q8_block(q.shape, block)
    levels = 255.0 if unsigned else 127.0
    qb = q.reshape(q.shape[:-1] + (q.shape[-1] // b, b)).astype(jnp.float32)
    return (qb * (scale[..., None] / levels)).reshape(q.shape)


def scale_by_adam_8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, block: int = 256
) -> optax.GradientTransformation:
    """Adam with blockwise 8-BIT moment storage (compute stays fp32).

    The flagship trace (docs/PROFILE.md) has the fused Adam update at the HBM
    roofline — the only single-chip lever is moving fewer bytes, and after
    `--moments-dtype bfloat16` (+5.3%) the remaining moment traffic is still
    2x the 8-bit floor. Scheme (the bitsandbytes blockwise recipe, built
    TPU-native as fusable elementwise ops — no gathers, static shapes):

    - first moment m: symmetric int8, per-(trailing-axis block of 256) fp32
      absmax scale; quantization error <=0.4% of the block absmax per step,
      the same order as bf16 moments;
    - second moment v: stored as sqrt(v) in uint8 per-block — sqrt halves the
      dynamic range the 8 bits must span, and sqrt(v) is exactly the quantity
      the update divides by, so the error lands where it is measured;
    - the update direction is computed from the FRESH fp32 m/v (quantization
      applies to what is STORED, not what is applied) — step 1 is bit-equal
      to fp32 Adam, steady-state direction error is O(0.5%);
    - moments keep the PARAM's shape and tree structure, so ZeRO-1/FSDP
      sharding (path-suffix match, parallel/sharding.py) and checkpointing
      apply unchanged; scales are ~1/256 the elements and stay replicated.

    Memory: 2 bytes/param optimizer state vs 8 (fp32) / 4 (bf16); at the
    docs/SCALING.md 234M-param FSDP config that is 1.87 GB -> 0.47 GB of
    moments. Opt-in via --moments-dtype int8."""

    def init(params):
        def zeros(p):
            shape = tuple(p.shape)
            if not shape:  # scalar params: keep a degenerate 1-block layout
                shape = (1,)
            b = _q8_block(shape, block)
            sshape = shape[:-1] + (shape[-1] // b,)
            return shape, sshape

        mu_q = jax.tree_util.tree_map(
            lambda p: jnp.zeros(zeros(p)[0], jnp.int8), params
        )
        nu_q = jax.tree_util.tree_map(
            lambda p: jnp.zeros(zeros(p)[0], jnp.uint8), params
        )
        mu_s = jax.tree_util.tree_map(
            lambda p: jnp.zeros(zeros(p)[1], jnp.float32), params
        )
        nu_s = jax.tree_util.tree_map(
            lambda p: jnp.zeros(zeros(p)[1], jnp.float32), params
        )
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32), mu_q=mu_q, mu_scale=mu_s, nu_q=nu_q, nu_scale=nu_s
        )

    def update(grads, state, params=None):
        del params

        def fresh(mq, ms, nq, ns, g):
            g32 = g.astype(jnp.float32)
            flat = g32.reshape((-1,)) if not g.shape else g32
            m = b1 * _q8_decode(mq, ms, False, block) + (1 - b1) * flat
            r = _q8_decode(nq, ns, True, block)  # sqrt(v)
            v = b2 * jnp.square(r) + (1 - b2) * jnp.square(flat)
            return m, v

        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def one(mq, ms, nq, ns, g):
            m, v = fresh(mq, ms, nq, ns, g)
            upd = ((m / c1) / (jnp.sqrt(v / c2) + eps)).astype(g.dtype)
            upd = upd.reshape(g.shape)
            new_mq, new_ms = _q8_encode(m, False, block)
            new_nq, new_ns = _q8_encode(jnp.sqrt(v), True, block)
            return upd, new_mq, new_ms, new_nq, new_ns

        out = jax.tree_util.tree_map(one, state.mu_q, state.mu_scale, state.nu_q, state.nu_scale, grads)
        treedef = jax.tree_util.tree_structure(grads)
        pick = lambda i: jax.tree_util.tree_unflatten(
            treedef, [leaf[i] for leaf in jax.tree_util.tree_leaves(out, is_leaf=lambda x: isinstance(x, tuple))]
        )
        return pick(0), ScaleByAdam8bitState(
            count=count, mu_q=pick(1), mu_scale=pick(2), nu_q=pick(3), nu_scale=pick(4)
        )

    return optax.GradientTransformation(init, update)


def build_optimizer(config: TrainingConfig, schedule) -> optax.GradientTransformation:
    """Optimizer from TrainingConfig: Adam (the reference optimizer,
    masked_pretraining/train.py:146) or AdamW when weight_decay > 0, with
    optional global-norm gradient clipping and an optional reduced LR for the
    pretrained 'backbone' subtree (fine-tuning)."""

    def make(lr_schedule):
        moments = getattr(config, "moments_dtype", "float32")
        wd = getattr(config, "weight_decay", 0.0)
        # decay only matrix-shaped params: biases and LayerNorm/BatchNorm
        # scales (ndim < 2) are excluded, the standard AdamW practice.
        # NOTE decoupled decay is coupled to the learning rate, so with
        # backbone_lr_scale != 1 the backbone group's decay scales by the
        # same factor.
        mask = lambda params: jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)
        if moments in ("bfloat16", "int8"):
            parts = [scale_by_adam_lowmem() if moments == "bfloat16" else scale_by_adam_8bit()]
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd, mask=mask))
            parts.append(optax.scale_by_learning_rate(lr_schedule))
            return optax.chain(*parts)
        if wd > 0:
            return optax.adamw(learning_rate=lr_schedule, weight_decay=wd, mask=mask)
        return optax.adam(learning_rate=lr_schedule)

    scale = getattr(config, "backbone_lr_scale", 1.0)
    if scale != 1.0:

        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "backbone" if getattr(path[0], "key", None) == "backbone" else "rest", params
            )

        opt = optax.multi_transform(
            {"backbone": make(lambda step: schedule(step) * scale), "rest": make(schedule)}, labels
        )
    else:
        opt = make(schedule)
    clip = getattr(config, "grad_clip", 0.0)
    if clip and clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    skip = getattr(config, "skip_nonfinite", 0)
    if skip and skip > 0:
        # skip (zero) the update on non-finite grads instead of poisoning the
        # params. max_consecutive_errors is effectively infinite so
        # apply_if_finite can never "give up and accept" a non-finite update;
        # the Trainer itself raises once `skip` CONSECUTIVE steps were skipped
        # (checked at every view step and at the end of fit()).
        opt = optax.apply_if_finite(opt, max_consecutive_errors=2**31 - 1)
    return opt


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

        self.schedule = build_schedule(config)
        self.tx = build_optimizer(config, self.schedule)
        self._nonfinite_limit = int(getattr(config, "skip_nonfinite", 0) or 0)
        # ZeRO-1 optimizer-state shardings; computed in init_state/place_state
        # (needs the concrete opt-state tree), read at train-step trace time
        self._opt_shardings = None

        donate = (0,) if config.donate_state else ()
        self._train_step = jax.jit(self._step, donate_argnums=donate)
        self._train_many = jax.jit(self._multi_step, donate_argnums=donate)

    def _param_shardings(self, params):
        if getattr(self.config, "fsdp", False):
            return fsdp_param_shardings(params, self.mesh)
        return param_shardings(params, self.mesh)

    # ------------------------------------------------------------------ setup
    def init_state(self, sample_batch: Any) -> TrainState:
        """Initialize params on host, place them sharded, init optimizer on
        device so moment tensors inherit the param shardings."""
        rng = jax.random.PRNGKey(self.config.seed)
        variables = self.task.init_variables(rng, sample_batch)
        variables = dict(variables)
        params = variables.pop("params")
        model_state = variables  # batch_stats / vq / ... (may be empty)

        shardings = self._param_shardings(params)
        params = jax.device_put(params, shardings)
        model_state = jax.device_put(model_state, replicated(self.mesh))
        opt_state = jax.jit(self.tx.init)(params)
        if getattr(self.config, "shard_opt_state", False):
            self._opt_shardings = zero1_opt_state_shardings(opt_state, params, self.mesh)
            opt_state = jax.device_put(opt_state, self._opt_shardings)
        else:
            # pin moments to their param's layout explicitly (path-suffix
            # match): GSPMD's propagation through jit(tx.init) covers
            # zeros_like-style moments but NOT shape-constructed ones (the
            # int8 state builds from shapes), and FSDP must never start with
            # replicated full-size moments
            opt_state = jax.device_put(
                opt_state,
                opt_state_shardings_like_params(opt_state, params, shardings, self.mesh),
            )

        return TrainState.create(params, model_state, opt_state, self.config.seed)

    def place_state(self, state: TrainState) -> TrainState:
        """(Re-)place a host-resident state (e.g. just loaded from a
        checkpoint) with this trainer's shardings, so resumed runs keep the
        tensor-parallel param layout and the ZeRO-1 optimizer partitioning."""
        param_placements = self._param_shardings(state.params)
        params = jax.device_put(state.params, param_placements)
        if getattr(self.config, "shard_opt_state", False):
            self._opt_shardings = zero1_opt_state_shardings(state.opt_state, params, self.mesh)
            opt_state = jax.device_put(state.opt_state, self._opt_shardings)
        else:
            # moments inherit their param's layout (path-suffix match), the
            # same layout jit(tx.init) gave them at init — resuming an FSDP
            # (or TP) run must NOT replicate full-size moments per chip
            opt_state = jax.device_put(
                state.opt_state,
                opt_state_shardings_like_params(
                    state.opt_state, state.params, param_placements, self.mesh
                ),
            )
        return state.replace(
            params=params,
            model_state=jax.device_put(state.model_state, replicated(self.mesh)),
            opt_state=opt_state,
        )

    # ------------------------------------------------------------- train step
    def _grads(self, state: TrainState, batch: Any, rng):
        """(grads, new_model_state, metrics) — one shot, or accumulated over
        `grad_accum` microbatches (leading dim split; grads averaged; losses
        averaged per-microbatch, the standard accumulation semantics).
        Activation memory scales with batch/grad_accum while the optimizer
        still sees one full-batch update."""
        grad_fn = jax.value_and_grad(self.task.loss_fn, has_aux=True)
        accum = max(1, getattr(self.config, "grad_accum", 1))
        if accum == 1:
            (loss, (new_model_state, metrics)), grads = grad_fn(
                state.params, state.model_state, batch, rng, True
            )
            metrics = dict(metrics)
            metrics.setdefault("loss", loss)
            return grads, new_model_state, metrics

        leading = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if leading % accum:
            raise ValueError(f"grad_accum={accum} must divide the batch size {leading}")
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]), batch
        )

        def body(carry, xs):
            model_state, grads_acc = carry
            mb, idx = xs
            (loss, (new_ms, metrics)), grads = grad_fn(
                state.params, model_state, mb, jax.random.fold_in(rng, idx), True
            )
            grads_acc = jax.tree_util.tree_map(lambda a, g: a + g, grads_acc, grads)
            metrics = dict(metrics)
            metrics.setdefault("loss", loss)
            return (new_ms, grads_acc), metrics

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_model_state, grads_sum), metrics_stack = jax.lax.scan(
            body, (state.model_state, zero_grads), (micro, jnp.arange(accum))
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads_sum)
        metrics = jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), metrics_stack)
        return grads, new_model_state, metrics

    def _step(self, state: TrainState, batch: Any):
        rng = state.step_rng()
        grads, new_model_state, metrics = self._grads(state, batch, rng)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        if self._opt_shardings is not None:
            # pin the ZeRO-1 layout: grads reduce-scatter into the moment
            # update, the elementwise Adam math runs 1/data_size per chip,
            # and only `updates` is all-gathered back to the param layout
            new_opt_state = jax.lax.with_sharding_constraint(new_opt_state, self._opt_shardings)
        if self._nonfinite_limit:
            # consecutive skipped (non-finite) updates; surfaced so fit() can
            # abort loudly instead of silently training in place
            metrics["notfinite_count"] = new_opt_state.notfinite_count
        new_params = optax.apply_updates(state.params, updates)
        # optional task hook (e.g. BYOL momentum-target EMA) — runs inside the
        # jitted step with the POST-optimizer params
        if hasattr(self.task, "post_update"):
            new_model_state = self.task.post_update(new_params, new_model_state)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    def _multi_step(self, state: TrainState, stacked_batches: Any):
        """K steps fused into one program with lax.scan — amortizes per-step
        dispatch (significant on remote transports) and lets XLA overlap the
        epilogue of step i with the prologue of step i+1. Batches are stacked
        on a leading K axis; returns the last step's metrics."""

        def body(carry, batch):
            new_state, metrics = self._step(carry, batch)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, stacked_batches)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    def train_step(self, state: TrainState, host_batch: Any):
        """One optimizer step. NOTE: the state argument is DONATED — its
        buffers are invalid afterwards; always continue from the returned
        state (set TrainingConfig.donate_state=False to keep old states)."""
        batch = shard_batch(host_batch, self.mesh)
        return self._train_step(state, batch)

    def train_many(self, state: TrainState, host_batches: list):
        """Run len(host_batches) optimizer steps in one device program.
        Falls back to sequential steps when batch shapes differ (ragged last
        batch, bucketed widths)."""
        import numpy as np

        shapes = {tuple(sorted((k, v.shape) for k, v in b.items())) for b in host_batches}
        if len(shapes) > 1:
            metrics = {}
            for batch in host_batches:
                state, metrics = self.train_step(state, batch)
            return state, metrics

        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *host_batches)
        stacked = shard_batch_leading(stacked, self.mesh)
        return self._train_many(state, stacked)

    def current_lr(self, state: TrainState) -> float:
        return float(self.schedule(state.step))

    def _check_nonfinite(self, count) -> None:
        """Abort once `skip_nonfinite` CONSECUTIVE updates were skipped for
        non-finite grads. The skipped updates were zeros (params intact) —
        raising here turns silent in-place spinning into a loud failure."""
        if not self._nonfinite_limit or count is None:
            return
        count = int(count)
        if count >= self._nonfinite_limit:
            raise RuntimeError(
                f"{count} consecutive non-finite gradient steps "
                f"(--skip-nonfinite limit {self._nonfinite_limit}); the skipped updates were "
                "zeroed so params are intact — halting instead of training in place"
            )

    # ------------------------------------------------------------------- loop
    def fit(
        self,
        state: TrainState,
        batches: Iterable[Any],
        start_iteration: Optional[int] = None,
        end_iteration: Optional[int] = None,
        view_step: Optional[int] = None,
        steps_per_call: int = 1,
        profile_dir: Optional[str] = None,
        profile_start: int = 10,
        profile_steps: int = 5,
        on_preempt: Optional[Callable] = None,
    ) -> TrainState:
        """Iteration-driven loop mirroring the reference's
        (masked_pretraining/trainer.py:19-50): the data iterator is recycled on
        exhaustion; `on_view_step(iteration, state, elapsed, count, metrics)`
        fires every `view_step` iterations.

        steps_per_call > 1 fuses that many optimizer steps into one scanned
        device program (train_many) — per-step dispatch overhead is amortized,
        which matters on remote/tunneled transports.

        profile_dir captures a device trace (TensorBoard/Perfetto) of
        `profile_steps` steps starting `profile_start` steps in (past the
        compile + warmup noise); the reference has no tracing (SURVEY.md §5).

        on_preempt(iteration, state) makes training PREEMPTION-SAFE: SIGTERM/
        SIGINT set a flag, the in-flight step finishes, the callback runs
        (checkpoint save in the CLIs) and fit returns — no partial update is
        ever persisted, and `--start-iteration -1` resumes exactly. The flag
        is polled both before pulling the next batch (so a signal arriving
        while the iterator blocks still saves) and after each device call;
        worst-case save latency is therefore one fused chunk — with
        steps_per_call=K that is K steps, so pick K such that K steps fit the
        platform's kill grace period. The reference loses all progress since
        the last view step on preemption (SURVEY.md §5: no failure story)."""
        start = int(state.step) if start_iteration is None else start_iteration
        end = self.config.end_iteration if end_iteration is None else end_iteration
        view = self.config.view_step if view_step is None else view_step
        k = max(1, steps_per_call)
        if view and k > 1 and view % k != 0:
            raise ValueError(f"view_step {view} must be a multiple of steps_per_call {k}")

        preempt_signal = {"num": None}
        old_handlers = {}
        if on_preempt is not None:
            import signal

            def _flag(signum, frame):
                del frame
                preempt_signal["num"] = signum

            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    old_handlers[sig] = signal.signal(sig, _flag)
                except ValueError:  # not in the main thread — no handler
                    pass

        iterator: Iterator = iter(batches)

        def pull():
            nonlocal iterator
            try:
                return next(iterator)
            except StopIteration:
                iterator = iter(batches)
                return next(iterator)

        t0 = time.time()
        count = 0
        metrics = {}
        trace_at = (start + profile_start) if profile_dir else None
        trace_until = None

        def preempted() -> bool:
            if preempt_signal["num"] is None:
                return False
            # finish-the-step-then-save: state is a consistent post-optimizer
            # snapshot at `iteration`
            print(f"preempted (signal {preempt_signal['num']}): saving at iteration {iteration}")
            on_preempt(iteration, state)
            return True

        iteration = start
        try:
            while iteration < end:
                # poll BEFORE pull(): a SIGTERM arriving while the data
                # iterator is blocked (stalled loader) must still reach the
                # checkpoint save. NOTE preemption-save latency is bounded by
                # one fused chunk — pick steps_per_call so chunk time fits the
                # platform's kill grace period.
                if preempted():
                    break
                if trace_at is not None and iteration >= trace_at:
                    jax.profiler.start_trace(profile_dir)
                    trace_until = iteration + profile_steps
                    trace_at = None
                chunk = min(k, end - iteration)
                if chunk == 1:
                    state, metrics = self.train_step(state, pull())
                else:
                    state, metrics = self.train_many(state, [pull() for _ in range(chunk)])
                iteration += chunk
                count += chunk

                if preempted():
                    break

                if trace_until is not None and iteration >= trace_until:
                    jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    print(f"profiler trace saved to {profile_dir}")
                    trace_until = None

                if view and iteration % view == 0:
                    if self._nonfinite_limit and "notfinite_count" in metrics:
                        self._check_nonfinite(metrics["notfinite_count"])
                    if self.on_view_step is not None:
                        # sync once per view step only
                        metrics = {key: float(v) for key, v in metrics.items()}
                        elapsed = time.time() - t0
                        self.on_view_step(iteration, state, elapsed, count, metrics)
                        t0 = time.time()
                        count = 0
        finally:
            if trace_until is not None:  # loop exited mid-trace
                jax.profiler.stop_trace()
            if old_handlers:
                import signal

                for sig, handler in old_handlers.items():
                    signal.signal(sig, handler)

        if self._nonfinite_limit:
            self._check_nonfinite(getattr(state.opt_state, "notfinite_count", None))
        return state
