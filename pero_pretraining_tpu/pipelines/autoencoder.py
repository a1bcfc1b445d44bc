"""AE / VQ-VAE tokenizer training pipeline.

Mirrors the reference autoencoders pipeline (reference: autoencoders/train.py,
trainer.py, model.py) on the generic Trainer. The VQ-VAE's EMA codebook state
is threaded through the train step via the `vq` variable collection instead of
the reference's in-forward buffer mutation (models/autoencoders.py:225-237).

Also reports codebook utilization (fraction of codes used per batch and
usage perplexity) — computed in the reference but never reported
(autoencoders/train.py:114 TODO).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from pero_pretraining_tpu.configs import AutoencoderConfig, TrainingConfig
from pero_pretraining_tpu.models.autoencoders import build_autoencoder


class AutoencoderTask:
    def __init__(self, model_config: AutoencoderConfig, training_config: TrainingConfig):
        self.model_config = model_config
        self.training_config = training_config
        dtype = jnp.bfloat16 if training_config.bfloat16 else jnp.float32
        self.model = build_autoencoder(model_config, dtype=dtype)

    def init_variables(self, rng: jax.Array, batch: Dict[str, Any]):
        init_rng, drop_rng = jax.random.split(rng)
        images = jnp.asarray(batch["images"][:1], dtype=jnp.float32) / 255.0
        init = jax.jit(lambda rngs, x: self.model.init(rngs, x, train=False))
        return init({"params": init_rng, "dropout": drop_rng}, images)

    def _corrupt(self, images: jax.Array, rng: jax.Array) -> jax.Array:
        """Device-side print-like corruption (fused into the jitted step):
        per-sample additive Gaussian noise + brightness/contrast jitter.
        Strength scales with TrainingConfig.denoising."""
        strength = self.training_config.denoising
        n = images.shape[0]
        k_std, k_noise, k_bright, k_contrast = jax.random.split(rng, 4)
        per = (n, 1, 1, 1)
        std = jax.random.uniform(k_std, per, minval=0.0, maxval=strength)
        noisy = images + jax.random.normal(k_noise, images.shape) * std
        contrast = 1.0 + jax.random.uniform(k_contrast, per, minval=-strength, maxval=strength)
        brightness = jax.random.uniform(k_bright, per, minval=-strength, maxval=strength)
        # contrast pivots about mid-gray so it is decoupled from brightness
        # (scaling about 0 on mostly-white line images would just be a second
        # brightness shift)
        return jnp.clip((noisy - 0.5) * contrast + 0.5 + brightness, 0.0, 1.0)

    def _apply(self, params, model_state, images, rng, train: bool, target=None):
        variables = {"params": params, **model_state}
        rngs = {"dropout": rng} if train else None
        mutable = list(model_state.keys()) if train else False
        if train and mutable:
            out, new_state = self.model.apply(
                variables, images, train=True, target=target, rngs=rngs, mutable=mutable
            )
            return out, dict(new_state)
        out = self.model.apply(variables, images, train=train, target=target, rngs=rngs)
        return out, model_state

    def loss_fn(self, params, model_state, batch, rng, train: bool):
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        target = None
        if train and self.training_config.denoising > 0:
            corrupt_rng, rng = jax.random.split(rng)
            images, target = self._corrupt(images, corrupt_rng), images
        out, new_model_state = self._apply(params, model_state, images, rng, train, target=target)

        metrics = {k: v for k, v in out.items() if k.startswith("loss")}
        if "counts" in out:
            counts = out["counts"].astype(jnp.float32)
            total = jnp.maximum(jnp.sum(counts), 1.0)
            probs = counts / total
            entropy = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
            metrics["codebook.used_fraction"] = jnp.mean((counts > 0).astype(jnp.float32))
            metrics["codebook.perplexity"] = jnp.exp(entropy)
        return out["loss"], (new_model_state, metrics)

    def eval_step(self, params, model_state, batch, rng):
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        out, _ = self._apply(params, model_state, images, rng, train=False)
        return out["loss"], {}
