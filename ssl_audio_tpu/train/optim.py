"""Optimizers and parameter grouping (reference main.py:314-347,
utils/utils.py:136-189, utils/hyperparameters.py:101-110).

Grouping rule (get_param_groups / LARS setup): params with ndim == 1 are
"biases" (no weight decay, no LARS adaptation, lr_biases); everything else is
"weights".  Frozen parameters (the random patch projection of non-conv-stem
ViTs, mae.py:190-192) get zero updates — the reference excludes them from the
optimizer via requires_grad=False.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax



def lr_factor_fn(cfg, niter_per_ep: int) -> Callable:
    """Traceable per-step LR factor.  With --lr_schedule, the reference's
    warmup+cosine factor (utils.py:48-59, peak batch_size/128, floor
    0.001x); otherwise constant 1."""
    if not cfg.lr_schedule:
        return lambda step: jnp.float32(1.0)
    max_steps = cfg.epochs * niter_per_ep * 1.25
    warmup_steps = int(cfg.epochs / 100) * niter_per_ep
    base_lr = cfg.batch_size / 128

    def factor(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        s = step - warmup_steps
        m = max_steps - warmup_steps
        q = 0.5 * (1 + jnp.cos(jnp.pi * s / m))
        cos_val = base_lr * q + (base_lr * 0.001) * (1 - q)
        return jnp.where((warmup_steps > 0) & (step < warmup_steps), warm, cos_val)

    return factor


class LarsState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates


def lars(
    lr_weights: float,
    lr_biases: float,
    factor_fn: Callable,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    eta: float = 0.001,
) -> optax.GradientTransformation:
    """Reference LARS (utils.py:150-189) with weight_decay_filter and
    lars_adaptation_filter both True (main.py:344-345): 1-D params skip both
    weight decay and the trust-ratio adaptation and use lr_biases."""

    def init(params):
        return LarsState(count=jnp.zeros((), jnp.int32),
                         mu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        f = factor_fn(state.count)

        def one_mu(g, p, mu):
            is_bias = p.ndim == 1
            dp = g if is_bias else g + weight_decay * p
            if not is_bias:
                p_norm = jnp.linalg.norm(p)
                u_norm = jnp.linalg.norm(dp)
                q = jnp.where(
                    p_norm > 0.0,
                    jnp.where(u_norm > 0.0, eta * p_norm / u_norm, 1.0),
                    1.0,
                )
                dp = dp * q
            return momentum * mu + dp

        new_mu = jax.tree.map(one_mu, grads, params, state.mu)
        updates = jax.tree.map(
            lambda mu, p: -((lr_biases if p.ndim == 1 else lr_weights) * f) * mu,
            new_mu,
            params,
        )
        return updates, LarsState(count=state.count + 1, mu=new_mu)

    return optax.GradientTransformation(init, update)


def _no_wd_mask(params):
    """True = weight-decayed (ndim > 1), matching get_param_groups
    (utils.py:136-147)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def frozen_param_mask(cfg, params) -> Optional[optax.Params]:
    """True for params that must not be updated: the non-conv-stem ViT patch
    projection (random patch projection, frozen)."""
    if "vit" not in cfg.model_type or cfg.model_type.startswith("vitc"):
        return None

    def label(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        return any("patch_embed" in str(n) for n in names)

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg, params, niter_per_ep: int) -> optax.GradientTransformation:
    factor = lr_factor_fn(cfg, niter_per_ep)
    if cfg.optimizer == "LARS":
        tx = lars(
            lr_weights=cfg.lr_weights,
            lr_biases=cfg.lr_biases,
            factor_fn=factor,
            weight_decay=cfg.wd,
        )
    elif cfg.optimizer == "AdamW":
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lambda step: cfg.lr * factor(step),
            weight_decay=cfg.wd,
            mask=_no_wd_mask,
        )
    elif cfg.optimizer == "Adam":
        tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=lambda step: cfg.lr * factor(step)
        )
    elif cfg.optimizer == "SGD":
        tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lambda step: cfg.lr * factor(step)
        )
    else:
        raise ValueError(f"Unknown optimizer {cfg.optimizer}")

    frozen = frozen_param_mask(cfg, params)
    if frozen is not None and any(jax.tree.leaves(frozen)):
        labels = jax.tree.map(lambda f: "frozen" if f else "train", frozen)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


def legacy_cosine_factor(
    base_value: float, final_value: float, epochs: int, niter_per_ep: int,
    warmup_epochs: int = 0, start_warmup_value: float = 0.0,
) -> Callable:
    """Traceable twin of the old-gen per-iteration cosine_scheduler
    (reference old/utils/utils.py:62-74, mirrored in
    utils/schedules.cosine_scheduler): linear warmup over
    warmup_epochs*niter iterations with np.linspace endpoint semantics
    (iteration i gets start + (base-start)*i/(warmup_iters-1)), then
    final + 0.5*(base-final)*(1+cos(pi*j/span)).  Exact array parity is
    asserted in tests/test_legacy_optim.py; steps past the nominal budget
    clamp to final_value (the reference array would IndexError there)."""
    warmup_iters = int(warmup_epochs * niter_per_ep)
    span = max(int(epochs * niter_per_ep) - warmup_iters, 1)

    def factor(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_iters > 1:
            warm = start_warmup_value + (base_value - start_warmup_value) * (
                step / (warmup_iters - 1)
            )
        else:
            warm = jnp.float32(start_warmup_value)
        j = jnp.clip(step - warmup_iters, 0, span)
        cos_val = final_value + 0.5 * (base_value - final_value) * (
            1 + jnp.cos(jnp.pi * j / span)
        )
        return jnp.where(step < warmup_iters, warm, cos_val)

    return factor


def make_legacy_optimizer(
    cfg, method: str, niter_per_ep: int
) -> optax.GradientTransformation:
    """The old-gen trainers' own optimizers (NOT the active-tree recipe):

    dino  — AdamW over the get_param_groups split (ndim>1 decayed) with a
            per-iteration cosine lr schedule (base_lr linearly scaled by
            batch/256, warmup_epochs warmup, floor final_lr) AND a cosine
            weight-decay schedule wd -> final_wd
            (old/methods/dino.py:125-147).
    byola — plain Adam over all params at a constant lr
            (old/byola/pretrain.py:142).

    The method defaults (AdamW 5e-4 / Adam 3e-4, wd 0.04 -> 0.4) are
    injected by setup_model_defaults(method=...); this factory falls back
    to the same values for configs built without the method argument."""
    if method == "byola":
        lr = cfg.base_lr if cfg.base_lr is not None else 3.0e-4
        return optax.adam(learning_rate=lr)
    if method != "dino":
        raise ValueError(f"no legacy optimizer for method {method!r}")
    base = cfg.base_lr if cfg.base_lr is not None else 5.0e-4
    # linear scaling rule, dino.py:136: base_lr * global_batch / 256
    # (cfg.batch_size is the global batch here; the reference writes it as
    # batch_size_per_gpu * world_size)
    lr_fn = legacy_cosine_factor(
        base * cfg.batch_size / 256.0, cfg.final_lr, cfg.epochs,
        niter_per_ep, warmup_epochs=cfg.warmup_epochs,
    )
    wd0 = cfg.wd if cfg.wd is not None else 0.04
    wd1 = cfg.final_wd if cfg.final_wd is not None else 0.4
    wd_fn = legacy_cosine_factor(wd0, wd1, cfg.epochs, niter_per_ep)
    # mask is a pytree-factory, not a schedule: keep it static under
    # inject_hyperparams or it would be called with the step count
    return optax.inject_hyperparams(optax.adamw, static_args=("mask",))(
        learning_rate=lr_fn, weight_decay=wd_fn, mask=_no_wd_mask
    )
