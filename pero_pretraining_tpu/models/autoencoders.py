"""AE and VQ-VAE tokenizer models.

Behavioral port of reference models/autoencoders.py redesigned functionally:

- `VGGEncoder` / `VGGDecoder` — 3-block VGG stacks with a height-collapsing
  aggregation conv / height-restoring upsample (reference: :6-80). NHWC.
- `AE` — plain autoencoder; Post-Quantized-AE targets come from k-means over
  its features afterwards (reference: :83-105).
- `VectorQuantizer` — nearest-neighbour codebook with straight-through
  gradients. The reference mutates EMA buffers inside forward
  (reference: :225-237); here the codebook, `ema_w` and `ema_cluster_size`
  live in a `vq` variable collection updated functionally when the collection
  is mutable (training) — the jitted train step threads them explicitly.
- `VQVAE` — encoder -> 1x1 projection -> VQ -> 1x1 projection -> decoder with
  recon + VQ loss and per-code usage counts (reference: :108-167).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from pero_pretraining_tpu.configs import AutoencoderConfig
from pero_pretraining_tpu.models.vgg import VggDecoderStack, VggEncoderStack
from pero_pretraining_tpu.ops.vq import vq_assign, vq_counts, vq_lookup, vq_stats


class VGGEncoder(nn.Module):
    """VGG encoder + (H', 1) aggregation conv collapsing height to 1
    (reference: models/autoencoders.py:6-47). Output (N, 1, S, C_out)."""

    config: AutoencoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.config
        x = VggEncoderStack(
            base_channels=cfg.base_channels,
            num_conv_blocks=cfg.num_conv_blocks,
            num_conv_layers=cfg.num_conv_layers,
            patch_size=cfg.patch_size,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="encoder",
        )(x, train=train)
        agg_height = cfg.height // (2**cfg.num_conv_blocks)
        x = nn.Conv(
            cfg.encoder_out_channels,
            kernel_size=(agg_height, 1),
            strides=(1, 1),
            padding="VALID",
            name="aggregation",
            dtype=self.dtype,
        )(x)
        return x


class VGGDecoder(nn.Module):
    """Height-restoring upsample + mirror VGG decoder (reference:
    models/autoencoders.py:50-80). Input (N, 1, S, C), output (N, H, W, 3)."""

    config: AutoencoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.config
        up_height = cfg.height // (2**cfg.num_conv_blocks)
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * up_height, w, c), method="bilinear")
        x = VggDecoderStack(
            out_channels=cfg.in_channels,
            base_channels=cfg.decoder_base_channels,
            num_conv_blocks=cfg.num_conv_blocks,
            num_conv_layers=cfg.decoder_num_conv_layers,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="decoder",
        )(x, train=train)
        return x


class VectorQuantizer(nn.Module):
    """Functional EMA vector quantizer (reference: models/autoencoders.py:170-241).

    decay > 0: codebook lives in the mutable `vq` collection and follows the
    reference's EMA recipe exactly, including the compounding Laplace
    smoothing of cluster sizes (:226-237). decay == 0: the codebook is a
    trainable param with the reference's q-latent loss term — note that the
    reference applies the straight-through detach BEFORE the loss sees the
    quantized values (:222, :239), so the q-latent gradient never actually
    reaches the embedding; we replicate that faithfully (the EMA default is
    the functioning path, and the one all reference configs use).
    """

    num_embeddings: int
    embeddings_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.99
    epsilon: float = 1e-5
    # Dead-code restarts (beyond reference): codes whose EMA cluster size
    # falls below this ABSOLUTE threshold are re-seeded from random encoder
    # outputs of the current batch. 0.0 = off (reference-faithful EMA). The
    # reference computes per-code usage `counts` but its utilization
    # reporting is a TODO (autoencoders/train.py:114) — codebook collapse is
    # exactly the failure that TODO was circling; restarts fix it at the
    # source. Deterministic: keyed on a step counter carried in the `vq`
    # collection, so runs reproduce bit-for-bit.
    restart_threshold: float = 0.0
    restart_seed: int = 0
    # Data-dependent codebook init (beyond reference): initialize the
    # codebook from (jittered) encoder outputs of the init batch instead of
    # normal(1.0). The normal init's code norms (~sqrt(D)) dwarf the
    # encoder-output blob, so a handful of closest codes win every
    # assignment from step 0 and EMA locks the collapse in (observed:
    # 7/128 codes used on the 50k tokenizer even with restarts). Starting
    # the codebook ON-distribution removes the scale mismatch. Off by
    # default (reference-faithful init).
    data_init: bool = False

    @nn.compact
    def __call__(self, inputs: jax.Array, *, train: bool = False):
        """inputs: (N, H, W, D) NHWC. Returns (quantized (N,H,W,D), indices (N*H*W,))."""
        shape = inputs.shape
        flat = inputs.reshape(-1, self.embeddings_dim).astype(jnp.float32)

        if self.decay > 0.0:
            # EMA mode: codebook + EMA accumulators, all non-param state
            if self.data_init:
                def _init_from_data(key, _shape):
                    rows = jax.random.randint(key, (self.num_embeddings,), 0, flat.shape[0])
                    seeds = jax.lax.stop_gradient(flat[rows])
                    # jitter breaks ties between duplicate rows (e.g. the
                    # many identical whitespace frames of padded lines)
                    jitter = 0.01 * jnp.std(flat) * jax.random.normal(
                        jax.random.fold_in(key, 1), seeds.shape
                    )
                    return seeds + jitter
                codebook_init = _init_from_data
                # cluster sizes start at 1 so step-1 embedding = ema_w /
                # cluster stays ~on-distribution instead of the reference
                # init's large first-step transient
                cluster_init = lambda *_: jnp.ones(self.num_embeddings, jnp.float32)
            else:
                codebook_init = nn.initializers.normal(1.0)
                cluster_init = lambda *_: jnp.zeros(self.num_embeddings, jnp.float32)
            embedding = self.variable(
                "vq", "embedding", codebook_init, self.make_rng("params") if self.is_initializing() else None,
                (self.num_embeddings, self.embeddings_dim),
            )
            # ema_w starts as a copy of the codebook so embedding ==
            # ema_w / cluster holds from step 0 in data_init mode (the
            # reference draws it independently; with cluster_init=0 its
            # value never matters before the first update overwrites it)
            ema_w = self.variable(
                "vq", "ema_w", (lambda *_: embedding.value) if self.data_init else codebook_init,
                self.make_rng("params") if self.is_initializing() else None,
                (self.num_embeddings, self.embeddings_dim),
            )
            ema_cluster_size = self.variable(
                "vq", "ema_cluster_size", cluster_init, None, None
            )
            if self.restart_threshold > 0.0:
                restart_step = self.variable(
                    "vq", "restart_step", lambda *_: jnp.zeros((), jnp.int32), None, None
                )
            codebook = embedding.value
        else:
            scale = 1.0 / self.num_embeddings
            codebook = self.param(
                "embedding",
                lambda key, shape_: jax.random.uniform(key, shape_, jnp.float32, -scale, scale),
                (self.num_embeddings, self.embeddings_dim),
            )

        indices = vq_assign(flat, jax.lax.stop_gradient(codebook))
        quantized = vq_lookup(indices, codebook).reshape(shape)

        if self.decay > 0.0 and train and not self.is_initializing():
            counts, dw = vq_stats(indices, flat, self.num_embeddings)
            new_cluster = ema_cluster_size.value * self.decay + (1.0 - self.decay) * counts
            n = jnp.sum(new_cluster)
            # reference stores the SMOOTHED size (compounds across steps, :230-232)
            new_cluster = (new_cluster + self.epsilon) / (n + self.num_embeddings * self.epsilon) * n
            new_ema_w = ema_w.value * self.decay + (1.0 - self.decay) * dw
            if self.restart_threshold > 0.0:
                # re-seed dead codes from random encoder outputs of this batch
                dead = new_cluster < self.restart_threshold  # (K,)
                key = jax.random.fold_in(
                    jax.random.PRNGKey(self.restart_seed), restart_step.value
                )
                rows = jax.random.randint(
                    key, (self.num_embeddings,), 0, flat.shape[0]
                )
                seeds = jax.lax.stop_gradient(flat[rows])  # (K, D)
                # jitter breaks ties between duplicate rows (whitespace
                # frames): without it several dead codes land on identical
                # points, only the lowest index ever wins, the rest re-die
                seeds = seeds + 0.01 * jnp.std(flat) * jax.random.normal(
                    jax.random.fold_in(key, 1), seeds.shape
                )
                new_cluster = jnp.where(dead, 1.0, new_cluster)
                new_ema_w = jnp.where(dead[:, None], seeds, new_ema_w)
                restart_step.value = restart_step.value + 1
            ema_cluster_size.value = new_cluster
            ema_w.value = new_ema_w
            embedding.value = new_ema_w / new_cluster[:, None]

        # straight-through estimator (reference: :239)
        quantized = inputs + jax.lax.stop_gradient(quantized.astype(inputs.dtype) - inputs)
        return quantized, indices

    def calculate_loss(self, tokens: jax.Array, features: jax.Array) -> jax.Array:
        """VQ loss (reference: :193-202): commitment (+ q-latent in non-EMA mode)."""
        tokens = tokens.astype(jnp.float32)
        features = features.astype(jnp.float32)
        e_latent = jnp.mean((jax.lax.stop_gradient(tokens) - features) ** 2)
        loss = self.commitment_cost * e_latent
        if self.decay <= 0.0:
            q_latent = jnp.mean((tokens - jax.lax.stop_gradient(features)) ** 2)
            loss = q_latent + loss
        return loss


class AE(nn.Module):
    """Plain autoencoder (reference: models/autoencoders.py:83-105)."""

    config: AutoencoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VGGEncoder(self.config, dtype=self.dtype)
        self.decoder = VGGDecoder(self.config, dtype=self.dtype)

    def encode(self, images, *, train: bool = False):
        return self.encoder(images, train=train)

    def __call__(self, images: jax.Array, *, train: bool = False, target=None) -> Dict[str, jax.Array]:
        """target: reconstruction target; defaults to the input (plain AE).
        A clean target with a corrupted input makes this a denoising AE."""
        target = images if target is None else target
        tokens = self.encoder(images, train=train)
        reconstructions = self.decoder(tokens, train=train)
        loss = jnp.mean((target.astype(jnp.float32) - reconstructions.astype(jnp.float32)) ** 2)
        return {"tokens": tokens, "loss": loss, "reconstructions": reconstructions}


class VQVAE(nn.Module):
    """VQ-VAE tokenizer (reference: models/autoencoders.py:108-167)."""

    config: AutoencoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = VGGEncoder(cfg, dtype=self.dtype)
        self.decoder = VGGDecoder(cfg, dtype=self.dtype)
        self.encoder_projection = nn.Conv(cfg.vq.embeddings_dim, kernel_size=(1, 1), name="encoder_projection", dtype=self.dtype)
        self.decoder_projection = nn.Conv(cfg.decoder_base_channels, kernel_size=(1, 1), name="decoder_projection", dtype=self.dtype)
        self.vq = VectorQuantizer(
            num_embeddings=cfg.vq.num_embeddings,
            embeddings_dim=cfg.vq.embeddings_dim,
            commitment_cost=cfg.vq.commitment_cost,
            decay=cfg.vq.decay,
            epsilon=cfg.vq.epsilon,
            restart_threshold=getattr(cfg.vq, "restart_threshold", 0.0),
            restart_seed=getattr(cfg.vq, "restart_seed", 0),
            data_init=getattr(cfg.vq, "data_init", False),
        )

    def encode(self, images, *, train: bool = False):
        return self.encoder(images, train=train)

    def quantize(self, features, *, train: bool = False):
        projected = self.encoder_projection(features)
        tokens, labels = self.vq(projected, train=train)
        return self.decoder_projection(tokens), labels, tokens, projected

    def __call__(self, images: jax.Array, *, train: bool = False, target=None) -> Dict[str, jax.Array]:
        cfg = self.config
        target = images if target is None else target
        features = self.encode(images, train=train)
        tokens, labels, vq_tokens, projected = self.quantize(features, train=train)
        reconstructions = self.decoder(tokens, train=train)

        images32 = target.astype(jnp.float32)
        recon32 = reconstructions.astype(jnp.float32)
        if cfg.reconstruction_loss.lower() in ("l2", "mse"):
            recon_loss = jnp.mean((images32 - recon32) ** 2)
        elif cfg.reconstruction_loss.lower() in ("l1", "mae"):
            recon_loss = jnp.mean(jnp.abs(images32 - recon32))
        else:
            raise ValueError(f"Unknown reconstruction loss: {cfg.reconstruction_loss}")

        # The reference computes the VQ loss between the decoder-projected
        # tokens and the raw encoder features — around the 1x1 projections,
        # not at the quantizer boundary (:131, :144-146, :159). Both are
        # encoder_out_channels-dim, so the shapes agree.
        vq_loss = self.vq.calculate_loss(tokens, features)
        loss = vq_loss + recon_loss

        counts = vq_counts(labels, cfg.vq.num_embeddings).astype(jnp.int32)
        return {
            "tokens": tokens,
            "labels": labels,
            "loss": loss,
            "loss.recon": recon_loss,
            "loss.vq": vq_loss,
            "reconstructions": reconstructions,
            "counts": counts,
        }


def build_autoencoder(config: AutoencoderConfig, *, dtype=jnp.float32):
    if config.type == "ae":
        return AE(config, dtype=dtype)
    if config.type == "vqvae":
        return VQVAE(config, dtype=dtype)
    raise ValueError(f"Unknown autoencoder type: {config.type}")
