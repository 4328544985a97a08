"""SpecAugment-style masking + label mixup for supervised finetuning
(reference old/data_manager/augmentations.py eval transforms and
old/evaluate/finetune.py), as batched device ops."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _axis_mask(key: jax.Array, B: int, size: int, max_width: int) -> jnp.ndarray:
    """(B, size) binary keep-mask with one random zeroed band per sample
    (torchaudio FrequencyMasking/TimeMasking semantics: width ~ U{0..max},
    start ~ U{0..size-width})."""
    k_w, k_s = jax.random.split(key)
    width = jax.random.randint(k_w, (B, 1), 0, max_width + 1)
    start = (jax.random.uniform(k_s, (B, 1))
             * (size - width + 1).astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.arange(size)[None, :]
    return ~((idx >= start) & (idx < start + width))


def freq_mask(key: jax.Array, lms: jnp.ndarray, max_width: int = 8) -> jnp.ndarray:
    """(B, C, F, T): zero a random frequency band per sample."""
    B, _, F, _ = lms.shape
    keep = _axis_mask(key, B, F, max_width)
    return lms * keep[:, None, :, None]


def time_mask(key: jax.Array, lms: jnp.ndarray, max_width: int = 20) -> jnp.ndarray:
    """(B, C, F, T): zero a random time band per sample."""
    B, _, _, T = lms.shape
    keep = _axis_mask(key, B, T, max_width)
    return lms * keep[:, None, None, :]


def mixup_batch(
    key: jax.Array, x: jnp.ndarray, y: jnp.ndarray, alpha: float = 0.2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Supervised mixup over a batch: convex-combine each sample with a
    permuted partner; labels mixed identically."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha, ())
    perm = jax.random.permutation(k_perm, x.shape[0])
    x2, y2 = x[perm], y[perm]
    return lam * x + (1 - lam) * x2, lam * y + (1 - lam) * y2
