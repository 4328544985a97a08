"""Barlow Twins cross-correlation loss (reference utils/loss.py:8-48).

Data-parallel design: the reference BatchNorm-normalizes per rank, computes a
local D x D cross-correlation, divides by the *local* batch and NCCL
all-reduces the matrix (loss.py:17-21) — so the DDP loss equals
world_size x (global-batch correlation with per-rank BN stats).

Here the embeddings arrive as one global-batch array sharded over the 'data'
mesh axis.  Plain jnp reductions over the batch axis are then global reductions
— XLA/GSPMD inserts the all-reduce the reference issues by hand, and the BN
statistics are global-batch (the mathematically cleaner choice; identical to
the reference at world_size=1).  `world_scale` reproduces the reference's
world_size multiplier when matching multi-GPU runs bit-for-bit matters.
"""
from __future__ import annotations

import jax.numpy as jnp

BN_EPS = 1e-5  # torch BatchNorm1d default


def _bn(z: jnp.ndarray) -> jnp.ndarray:
    """BatchNorm1d(affine=False) training-mode normalization: batch mean,
    biased variance, eps=1e-5."""
    mean = z.mean(axis=0, keepdims=True)
    var = z.var(axis=0, keepdims=True)          # biased, as torch BN
    return (z - mean) / jnp.sqrt(var + BN_EPS)


def barlow_twins_pair_loss(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    lmbda: float = 0.005,
    alpha: float = 1.0,
    HSIC: bool = False,
    world_scale: float = 1.0,
) -> jnp.ndarray:
    """Loss for one (teacher, student) view pair; reference forward_loss
    (loss.py:15-30)."""
    B = z1.shape[0]
    c = jnp.matmul(_bn(z1).T, _bn(z2)) / B
    c = c * world_scale
    diag = jnp.diagonal(c)
    on_diag = jnp.sum((diag - 1.0) ** 2)
    if HSIC:
        # encourage off-diagonal terms toward -1 (loss.py:24-26)
        off_all = jnp.sum((c + 1.0) ** 2) - jnp.sum((diag + 1.0) ** 2)
    else:
        off_all = jnp.sum(c ** 2) - jnp.sum(diag ** 2)
    return alpha * on_diag + lmbda * off_all


def barlow_twins_loss(
    student_views,
    teacher_views,
    lmbda: float = 0.005,
    alpha: float = 1.0,
    HSIC: bool = False,
    world_scale: float = 1.0,
) -> jnp.ndarray:
    """Multi-crop pairing (reference forward: loss.py:32-48).

    student_views / teacher_views: lists of (B, D) embeddings.  When the
    teacher has >1 views, same-index pairs are skipped (the BYOL-variant path,
    main_bt_byol.py:103-107 with ngcrops_each=2)."""
    total, n_terms = 0.0, 0
    for q, tz in enumerate(teacher_views):
        for v, sz in enumerate(student_views):
            if len(teacher_views) > 1 and q == v:
                continue
            total = total + barlow_twins_pair_loss(
                tz, sz, lmbda=lmbda, alpha=alpha, HSIC=HSIC, world_scale=world_scale
            )
            n_terms += 1
    return total / n_terms
