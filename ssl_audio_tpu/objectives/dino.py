"""DINO objective — the reference's second SSL family
(old/methods/dino.py:295-388): weight-normed projection head and
centered/sharpened cross-entropy with EMA center.

The center update's NCCL all_reduce (dino.py:380-383) disappears here: with
the teacher outputs sharded over the 'data' mesh, the batch mean IS the global
mean under GSPMD.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DINOHead(nn.Module):
    """MLP -> L2-normalize -> weight-normalized linear (dino.py:295-329)."""

    out_dim: int
    use_bn: bool = False
    norm_last_layer: bool = True
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.02)
        n = max(self.nlayers, 1)
        if n == 1:
            x = nn.Dense(self.bottleneck_dim, kernel_init=init)(x)
        else:
            x = nn.Dense(self.hidden_dim, kernel_init=init)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.gelu(x, approximate=False)
            for _ in range(n - 2):
                x = nn.Dense(self.hidden_dim, kernel_init=init)(x)
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.bottleneck_dim, kernel_init=init)(x)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
        # weight-normalized last layer: w = g * v/||v||, g frozen at 1 when
        # norm_last_layer (dino.py:314-317)
        v = self.param("last_layer_v", init, (self.bottleneck_dim, self.out_dim))
        g = self.param("last_layer_g", nn.initializers.ones, (self.out_dim,))
        if self.norm_last_layer:
            g = jax.lax.stop_gradient(g)
        w = g * v / jnp.linalg.norm(v, axis=0, keepdims=True).clip(1e-12)
        return x @ w


def teacher_temp_schedule(
    warmup_teacher_temp: float, teacher_temp: float,
    warmup_teacher_temp_epochs: int, nepochs: int,
) -> np.ndarray:
    return np.concatenate((
        np.linspace(warmup_teacher_temp, teacher_temp, warmup_teacher_temp_epochs),
        np.ones(max(nepochs - warmup_teacher_temp_epochs, 0)) * teacher_temp,
    ))


def dino_loss(
    student_views: List[jnp.ndarray],
    teacher_views: List[jnp.ndarray],
    center: jnp.ndarray,
    teacher_temp,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (loss, new_center).  Semantics of DINOLoss.forward
    (dino.py:350-388): teacher views softmax((t - center)/temp) vs student
    log-softmax(s/student_temp); same-index pairs skipped; center EMA over
    the (global) teacher batch."""
    total, n_terms = 0.0, 0
    t_probs = [
        jax.lax.stop_gradient(
            jax.nn.softmax((t - center) / teacher_temp, axis=-1)
        )
        for t in teacher_views
    ]
    for iq, q in enumerate(t_probs):
        for v, s in enumerate(student_views):
            if v == iq:
                continue
            logp = jax.nn.log_softmax(s / student_temp, axis=-1)
            total = total + jnp.mean(jnp.sum(-q * logp, axis=-1))
            n_terms += 1
    loss = total / max(n_terms, 1)

    teacher_all = jnp.concatenate(teacher_views, axis=0)
    batch_center = teacher_all.mean(axis=0, keepdims=True)
    new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return loss, jax.lax.stop_gradient(new_center)
