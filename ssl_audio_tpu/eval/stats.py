"""Per-class classification statistics: AP (mAP), AUC, d-prime
(reference old/utils/stats.py:17-60)."""
from __future__ import annotations

from typing import List

import numpy as np
from scipy import stats as scipy_stats


def d_prime(auc: float) -> float:
    return scipy_stats.norm().ppf(auc) * np.sqrt(2.0)


def calculate_stats(output: np.ndarray, target: np.ndarray) -> List[dict]:
    """output: (N, C) scores; target: (N, C) binary. One dict per class with
    AP and AUC (classes without positives are skipped, as sklearn would
    error)."""
    from sklearn.metrics import average_precision_score, roc_auc_score

    stats = []
    for k in range(target.shape[1]):
        t, o = target[:, k], output[:, k]
        if t.sum() == 0 or t.sum() == len(t):
            continue
        avg_precision = average_precision_score(t, o)
        auc = roc_auc_score(t, o)
        stats.append({
            "AP": avg_precision,
            "auc": auc,
            "d_prime": d_prime(auc),
            "class": k,
        })
    return stats


def mean_average_precision(output: np.ndarray, target: np.ndarray) -> float:
    s = calculate_stats(output, target)
    return float(np.mean([x["AP"] for x in s])) if s else float("nan")
