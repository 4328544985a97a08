"""Embedding extraction, including the ViT 96-frame unit splitter
(reference utils.py:278-314 encode_vit / hear/sample/vit.py:109-126).

TPU-first change: the reference loops over units in python, one forward per
unit; here the (B, 1, F, T) clip batch is reshaped into (B*U, 1, F, unit) and
encoded in ONE batched forward — embarrassingly parallel, as SURVEY.md §5
prescribes."""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np
from einops import rearrange


def pad_to_unit_multiple(x: jnp.ndarray, unit_frames: int) -> jnp.ndarray:
    """Zero-pad time so it divides unit_frames.  NOTE: the reference pads by
    `unit - (T % unit)` even when T already divides (utils.py:283-285), adding
    a full silent unit; replicated for parity."""
    pad = unit_frames - (x.shape[-1] % unit_frames)
    if pad > 0:
        cfgpad = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = jnp.pad(x, cfgpad)
    return x


def encode_vit(
    apply_fn: Callable,
    x: jnp.ndarray,
    unit_frames: int,
    use_cls: bool = True,
    patch_fbins: int = 4,
    embed_d: int = 768,
) -> jnp.ndarray:
    """(B, 1, F, T) -> (B, D) [use_cls] or (B, patch_fbins*D) mean over units.

    apply_fn(x, return_all) -> CLS embedding (B', D) or all tokens
    (B', 1+L, D)."""
    B = x.shape[0]
    T_orig = x.shape[-1]
    # Reference quirk: when T already divides unit_frames a FULL silent unit
    # is still appended (utils.py:283-285).  Its inputs are identical zeros
    # for every sample, so (use_cls) its CLS is ONE constant folded into the
    # mean, and (dense path) its tokens are the exact tail the reference
    # removes afterwards — in both cases the B dead forwards are skipped.
    full_silent = T_orig % unit_frames == 0 and T_orig > 0
    if not full_silent:
        x = pad_to_unit_multiple(x, unit_frames)
    n_units = x.shape[-1] // unit_frames
    # (B, 1, F, U*unit) -> (B*U, 1, F, unit)
    xu = rearrange(x, "b c f (u t) -> (b u) c f t", t=unit_frames)

    if use_cls:
        emb = apply_fn(xu, False)                          # (B*U, D)
        emb = rearrange(emb, "(b u) d -> b u d", b=B)
        if full_silent:
            zero = apply_fn(jnp.zeros_like(xu[:1]), False)  # (1, D)
            return (emb.sum(axis=1) + zero) / (n_units + 1)
        return emb.mean(axis=1)

    tokens = apply_fn(xu, True)[:, 1:, :]                  # (B*U, L, D)
    emb = rearrange(tokens, "(b u) (f t) d -> b (u t) (f d)",
                    b=B, f=patch_fbins, d=embed_d)
    if not full_silent:
        # remove padded tail frames (utils.py:307-309)
        pad_frames = n_units * unit_frames - T_orig
        t_per_unit = tokens.shape[1] // patch_fbins
        pad_emb_frames = int(t_per_unit * pad_frames / unit_frames)
        if pad_emb_frames > 0:
            emb = emb[:, :-pad_emb_frames]
    return emb.mean(axis=1)


def encode_lms_units(
    apply_fn: Callable, x: jnp.ndarray, unit_frames: int
) -> jnp.ndarray:
    """HEAR encode_lms (hear/sample/vit.py:109-126): per-unit CLS tokens
    stacked -> (B, U, D).

    When T already divides unit_frames the reference still appends a FULL
    silent unit (pad = unit - T%unit is never 0; hear/sample/vit.py:113-115,
    utils/utils.py:283-285) and averages its CLS into the embedding.  That
    silent unit's input rows are identical zeros for every sample (padding
    is applied AFTER normalization), so in eval mode its embedding is one
    constant vector: forward it ONCE at batch 1 and broadcast instead of
    running B dead forwards.  Same values, half the compute — this is the
    HEAR timestamp hot path (950 ms windows = exactly one 96-frame unit;
    the quirk doubled every window's encoder cost, PERF.md r3)."""
    B = x.shape[0]
    pad = unit_frames - (x.shape[-1] % unit_frames)
    if pad == unit_frames and x.shape[-1] > 0:
        xu = rearrange(x, "b c f (u t) -> (b u) c f t", t=unit_frames)
        emb = apply_fn(xu, False)
        emb = rearrange(emb, "(b u) d -> b u d", b=B)
        zero = apply_fn(jnp.zeros_like(xu[:1]), False)       # (1, D)
        zrep = jnp.broadcast_to(zero[None, :], (B, 1, zero.shape[-1]))
        return jnp.concatenate([emb, zrep.astype(emb.dtype)], axis=1)
    x = pad_to_unit_multiple(x, unit_frames)
    xu = rearrange(x, "b c f (u t) -> (b u) c f t", t=unit_frames)
    emb = apply_fn(xu, False)
    return rearrange(emb, "(b u) d -> b u d", b=B)


def extract_embeddings(
    forward: Callable,
    loader,
    to_device: Callable = jnp.asarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Run `forward(batch)` over a loader, return (embeddings, targets)
    (reference main.py:174-195 get_embeddings)."""
    embs, targets = [], []
    for x, y in loader:
        embs.append(np.asarray(forward(to_device(x))))
        targets.append(np.asarray(y))
    return np.concatenate(embs), np.concatenate(targets)
