"""AudioNTT2022 encoder (BYOL-A v2 CNN) — the flagship conv encoder
(reference model.py:130-210).

Layout is NHWC internally (TPU-native channels-last convs); the public
interface takes the reference's (B, 1, n_mels, T) NCHW batches.

Architecture (n_mels=64, d=3072):
  2 x [Conv3x3(64) - BN - ReLU - MaxPool2x2 (- SE)]          -> (B, 16, T/4, 64)
  per-timeframe flatten (mel x ch = 1024)
  FC: 1024 -> 2048 -> ReLU -> Dropout(0.3) -> 2048 -> ReLU
  stack conv features with FC features -> (B, T/4, 3072)
  mean+max pooling over time                                  -> (B, 3072)
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference model.py:194-210); NHWC input."""

    r: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))                               # (B, C)
        y = nn.Dense(c // self.r, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


def mean_max_pooling(frames: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, D): max-over-time + mean-over-time
    (reference model.py:186-191)."""
    return frames.max(axis=1) + frames.mean(axis=1)


class AudioNTT2022Encoder(nn.Module):
    n_mels: int = 64
    d: int = 3072
    base_d: int = 64
    mlp_hidden_d: int = 2048
    conv_layers: int = 2
    stack: bool = True
    squeeze_excitation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, 1, F, T) -> frame embeddings (B, T', d)."""
        h = jnp.transpose(x, (0, 2, 3, 1))                    # NHWC (B, F, T, 1)
        for _ in range(self.conv_layers):
            h = nn.Conv(self.base_d, (3, 3), strides=1, padding=1)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)
            h = nn.relu(h)
            # NOTE: a reshape+axis-max pool (to dodge the 2.9 ms
            # select-and-scatter backward, PERF.md trace) was tried and
            # measured SLOWER overall (26.2 -> 32.0 ms/step at B=256): the
            # eq-mask backward + broken producer fusion cost more than
            # select-and-scatter.  nn.max_pool stays.
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            if self.squeeze_excitation:
                h = SEBlock()(h)
        # (B, F', T', C) -> (B, T', F'*C): time-major frames, mel x channel
        # features; matches reference permute(0,3,2,1).reshape (model.py:167-169)
        B, Fp, Tp, C = h.shape
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(B, Tp, Fp * C)
        conv_d = self.base_d * (self.n_mels // (2 ** self.conv_layers))
        assert h.shape[-1] == conv_d
        y = nn.Dense(self.mlp_hidden_d)(h)
        y = nn.relu(y)
        y = nn.Dropout(0.3, deterministic=not train)(y)
        y = nn.Dense(self.d - conv_d)(y)
        y = nn.relu(y)
        if self.stack:
            return jnp.concatenate([h, y], axis=-1)           # (B, T', d)
        return y


class AudioNTT2022(nn.Module):
    """Pooled encoder: (B, 1, F, T) -> (B, d)."""

    n_mels: int = 64
    d: int = 3072
    mlp_hidden_d: int = 2048
    squeeze_excitation: bool = False

    @property
    def embed_dim(self) -> int:
        return self.d

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        frames = AudioNTT2022Encoder(
            n_mels=self.n_mels,
            d=self.d,
            mlp_hidden_d=self.mlp_hidden_d,
            squeeze_excitation=self.squeeze_excitation,
            name="encoder",
        )(x, train=train)
        return mean_max_pooling(frames)
