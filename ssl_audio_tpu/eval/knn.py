"""Weighted-cosine kNN monitor (reference utils.py:192-235 eval_knn):
k=200, temperature 0.5, exp-scaled similarity voting."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def knn_predict(
    features: jnp.ndarray,      # (B, D) query features
    bank: jnp.ndarray,          # (N, D) memory bank features
    bank_labels: jnp.ndarray,   # (N,) int labels
    n_classes: int,
    k: int = 200,
    temperature: float = 0.5,
) -> jnp.ndarray:
    """Returns class scores (B, n_classes)."""
    f = features / jnp.linalg.norm(features, axis=1, keepdims=True).clip(1e-12)
    b = bank / jnp.linalg.norm(bank, axis=1, keepdims=True).clip(1e-12)
    sim = f @ b.T                                          # (B, N)
    k = min(k, bank.shape[0])
    w, idx = jax.lax.top_k(sim, k)                         # (B, k)
    w = jnp.exp(w / temperature)
    labels = bank_labels[idx]                              # (B, k)
    onehot = jax.nn.one_hot(labels, n_classes)             # (B, k, C)
    return (onehot * w[..., None]).sum(axis=1)


def eval_knn(
    forward, memory_loader, test_loader, n_classes: int,
    k: int = 200, temperature: float = 0.5,
) -> tuple[float, float]:
    """(top1, top5) accuracy in percent."""
    feats, labels = [], []
    for x, y in memory_loader:
        feats.append(np.asarray(forward(jnp.asarray(x))))
        labels.append(np.asarray(y))
    bank = jnp.asarray(np.concatenate(feats))
    bank_labels = jnp.asarray(np.concatenate(labels).astype(np.int32))
    if bank_labels.ndim == 2:                              # one-hot -> index
        bank_labels = bank_labels.argmax(-1)

    total = top1 = top5 = 0
    for x, y in test_loader:
        y = np.asarray(y)
        if y.ndim == 2:
            y = y.argmax(-1)
        scores = np.asarray(
            knn_predict(jnp.asarray(np.asarray(forward(jnp.asarray(x)))),
                        bank, bank_labels, n_classes, k, temperature)
        )
        order = np.argsort(-scores, axis=1)
        total += len(y)
        top1 += (order[:, 0] == y).sum()
        top5 += (order[:, :5] == y[:, None]).any(axis=1).sum()
    return 100.0 * top1 / total, 100.0 * top5 / total


def knn_map(
    features: np.ndarray,
    labels: np.ndarray,
    bank: np.ndarray,
    bank_labels: np.ndarray,
    k: int = 200,
    temperature: float = 0.5,
) -> float:
    """Multi-label kNN mAP (reference old/utils/knn_metric.py:23-97):
    class scores = similarity-weighted votes of the k nearest bank entries'
    multi-hot labels, evaluated with macro average precision."""
    from sklearn.metrics import average_precision_score

    f = features / np.linalg.norm(features, axis=1, keepdims=True).clip(1e-12)
    b = bank / np.linalg.norm(bank, axis=1, keepdims=True).clip(1e-12)
    sim = f @ b.T
    k = min(k, bank.shape[0])
    idx = np.argpartition(-sim, k - 1, axis=1)[:, :k]
    w = np.exp(np.take_along_axis(sim, idx, axis=1) / temperature)  # (B, k)
    votes = np.einsum("bk,bkc->bc", w, bank_labels[idx])            # (B, C)
    keep = labels.sum(axis=0) > 0
    return float(average_precision_score(labels[:, keep], votes[:, keep]))
