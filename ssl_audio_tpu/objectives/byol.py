"""BYOL-A objective (reference old/byola/byol_pytorch.py:47-50): MSE between
L2-normalized online predictions and target projections = 2 - 2*cosine."""
from __future__ import annotations

import jax.numpy as jnp


def byol_loss_fn(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-sample loss (B,): 2 - 2 <x/|x|, y/|y|>."""
    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    yn = y / jnp.linalg.norm(y, axis=-1, keepdims=True).clip(1e-12)
    return 2.0 - 2.0 * (xn * yn).sum(axis=-1)


def byol_symmetric_loss(
    online_pred_1: jnp.ndarray, target_proj_2: jnp.ndarray,
    online_pred_2: jnp.ndarray, target_proj_1: jnp.ndarray,
) -> jnp.ndarray:
    """Symmetrized BYOL loss over both view assignments (byol_pytorch.py
    forward: loss_one + loss_two, averaged)."""
    l1 = byol_loss_fn(online_pred_1, target_proj_2)
    l2 = byol_loss_fn(online_pred_2, target_proj_1)
    return (l1 + l2).mean()
