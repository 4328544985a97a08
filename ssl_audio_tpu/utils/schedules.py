"""LR / mask-ratio schedules (reference utils/utils.py:48-91)."""
from __future__ import annotations

import numpy as np


def adjust_learning_rate_factor(
    epochs: int, niter_per_ep: int, batch_size: int, step: int
) -> float:
    """The scalar LR factor of reference adjust_learning_rate
    (utils.py:48-59): warmup over epochs/100 epochs, then cosine to
    0.001*base over 1.25x the nominal step budget.  The result multiplies
    lr (Adam*/SGD) or lr_weights/lr_biases (LARS)."""
    max_steps = epochs * niter_per_ep * 1.25
    warmup_steps = int(epochs / 100) * niter_per_ep
    base_lr = batch_size / 128
    if warmup_steps > 0 and step < warmup_steps:
        return base_lr * step / warmup_steps
    step = step - warmup_steps
    max_steps = max_steps - warmup_steps
    q = 0.5 * (1 + np.cos(np.pi * step / max_steps))
    end_lr = base_lr * 0.001
    return base_lr * q + end_lr * (1 - q)


def cosine_scheduler(
    base_value, final_value, epochs, niter_per_ep, warmup_epochs=0, start_warmup_value=0
) -> np.ndarray:
    """Per-iteration cosine schedule with linear warmup (utils.py:68-78)."""
    warmup_schedule = np.array([])
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    return np.concatenate((warmup_schedule, schedule))


def sine_scheduler_increase(
    final_value, epochs, niter_per_ep, warmup_epochs=0, warmup_value=0
) -> np.ndarray:
    """Increasing quarter-sine schedule for the mask ratio (utils.py:81-91)."""
    warmup_schedule = np.array([])
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(warmup_value, warmup_value, warmup_iters)
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = (final_value - warmup_value) * np.sin((np.pi / 2) * (iters / len(iters)))
    return np.concatenate((warmup_schedule, schedule))
