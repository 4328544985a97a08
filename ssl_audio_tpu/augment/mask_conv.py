"""Patch-wise random masking for conv encoders (reference
old/utils/mask_conv.py:12-59, which uses unfold/fold): zero random
patch-aligned regions of the spectrogram.  Pure reshape — no gather."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mask_conv(
    key: jax.Array,
    x: jnp.ndarray,                       # (B, C, F, T)
    mask_ratio: float,
    patch_size: Tuple[int, int] = (16, 16),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masked_x, mask) with mask (B, L): 1 = removed patch."""
    B, C, F, T = x.shape
    ph, pw = patch_size
    gh, gw = F // ph, T // pw
    L = gh * gw
    len_keep = int(L * (1 - mask_ratio))
    noise = jax.random.uniform(key, (B, L))
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    mask = (ranks >= len_keep).astype(x.dtype)             # (B, L)
    keep = 1.0 - mask.reshape(B, 1, gh, 1, gw, 1)
    patches = x.reshape(B, C, gh, ph, gw, pw)
    return (patches * keep).reshape(B, C, F, T), mask
