"""Projection heads.

- LinearHead: frame-wise D -> vocabulary logits (reference:
  masked_pretraining/model.py:98-105). Output dim sharded over the `model`
  mesh axis (the 512x4096 matmul dominates the head cost).
- MLPHead: VICReg/SimCLR-style projector (reference:
  joint_embedding_pretraining/model.py:79-115). The reference reshapes
  (N, S, D) -> (N*S, D) for BatchNorm1d; here BatchNorm normalizes over
  (N, S) jointly, which is the same statistic.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pero_pretraining_tpu.configs import HeadConfig


class LinearHead(nn.Module):
    out_features: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        return nn.Dense(self.out_features, name="linear", dtype=self.dtype)(x)


class MLPHead(nn.Module):
    hidden_dim: int = 8192
    num_layers: int = 3
    use_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, name=f"fc{i}", dtype=self.dtype)(x)
            if self.use_bn:
                # normalize over all frames of all lines, like the reference's
                # (N*S, D) BatchNorm1d reshape
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis=-1,
                    axis_name=None,
                    name=f"bn{i}",
                    dtype=self.dtype,
                )(x)
            x = nn.relu(x)
        return nn.Dense(self.hidden_dim, name=f"fc{self.num_layers - 1}", dtype=self.dtype)(x)


def build_head(config: HeadConfig, *, dtype=jnp.float32) -> nn.Module:
    if config.type == "linear":
        return LinearHead(out_features=config.out_features, dtype=dtype)
    if config.type == "mlp":
        return MLPHead(
            hidden_dim=config.hidden_dim, num_layers=config.num_layers, use_bn=config.use_bn, dtype=dtype
        )
    raise ValueError(f"Unknown head type: {config.type}")
