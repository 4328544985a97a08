"""Barlow Twins projector / predictor heads (reference model.py:11-53).

Both are applied per-view (the reference chunks the crop-concatenated batch and
runs the head per chunk, so BatchNorm statistics are per-view — model.py:25-31;
we keep views as separate arrays, which gives the same statistics)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BarlowTwinsHead(nn.Module):
    """MLP projector: in -> [hidden]*n -> out.
    Linear(bias=False) + BN1d + ReLU per hidden layer, final plain
    Linear(bias=False)."""

    projector_n_hidden_layers: int = 1
    projector_hidden_dim: int = 8192
    projector_out_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for _ in range(self.projector_n_hidden_layers):
            x = nn.Dense(self.projector_hidden_dim, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
            x = nn.relu(x)
        return nn.Dense(self.projector_out_dim, use_bias=False)(x)


class BarlowTwinsPredictor(nn.Module):
    """Optional 2-layer predictor (identity when use=False)."""

    use: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if not self.use:
            return x
        d = x.shape[-1]
        y = nn.Dense(d, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(y)
        y = nn.relu(y)
        return nn.Dense(d, use_bias=False)(y)
