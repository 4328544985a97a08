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
    x = pad_to_unit_multiple(x, unit_frames)
    n_units = x.shape[-1] // unit_frames
    # (B, 1, F, U*unit) -> (B*U, 1, F, unit)
    xu = rearrange(x, "b c f (u t) -> (b u) c f t", t=unit_frames)

    if use_cls:
        emb = apply_fn(xu, False)                          # (B*U, D)
        emb = rearrange(emb, "(b u) d -> b u d", b=B)
        return emb.mean(axis=1)

    tokens = apply_fn(xu, True)[:, 1:, :]                  # (B*U, L, D)
    emb = rearrange(tokens, "(b u) (f t) d -> b (u t) (f d)",
                    b=B, f=patch_fbins, d=embed_d)
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
    stacked -> (B, U, D)."""
    B = x.shape[0]
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
