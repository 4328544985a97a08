"""Orbax checkpoint / resume (reference main.py:484-496, utils.py:37-46).

The whole TrainState (params, batch stats, optimizer state, augmentation ring
buffer, step) is one pytree with stable names — no DDP/MultiCrop prefix
surgery is ever needed on load (the reference's consumers strip
"backbone.encoder." prefixes by trial and error, linear.py:122-131)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


# ---------------------------------------------------------------------------
# Deterministic resume (SURVEY.md §5): the reference re-derives all RNG from
# the seed on resume (utils.py:37-46 restores no generator state), so a
# resumed run sees different augmentation/mask randomness than an
# uninterrupted one.  Here the Trainer's jax key and host numpy generator are
# serialized into the checkpoint so a (train k, resume, train n-k) run is
# bit-identical to an uninterrupted n-epoch run.
# ---------------------------------------------------------------------------

def encode_rng(rng_key: jax.Array, host_rng: np.random.Generator) -> dict:
    """Pack (jax key, numpy PCG64 generator) into a pytree of arrays that
    Orbax can store: the raw key data plus the PCG64 128-bit state/inc and
    cached-uint32 words split into uint64 lanes."""
    st = host_rng.bit_generator.state
    assert st["bit_generator"] == "PCG64", st["bit_generator"]
    mask = (1 << 64) - 1

    def split128(v: int):
        return [v & mask, (v >> 64) & mask]

    words = (
        split128(st["state"]["state"])
        + split128(st["state"]["inc"])
        + [int(st["has_uint32"]), int(st["uinteger"])]
    )
    return {
        "key_data": np.asarray(jax.random.key_data(rng_key)),
        "host_pcg64": np.asarray(words, np.uint64),
    }


def decode_rng(tree: dict) -> tuple[jax.Array, np.random.Generator]:
    key = jax.random.wrap_key_data(jnp.asarray(tree["key_data"]))
    w = [int(x) for x in np.asarray(tree["host_pcg64"])]
    host = np.random.default_rng(0)
    host.bit_generator.state = {
        "bit_generator": "PCG64",
        "state": {"state": w[0] | (w[1] << 64), "inc": w[2] | (w[3] << 64)},
        "has_uint32": w[4],
        "uinteger": w[5],
    }
    return key, host


def save_checkpoint(path: str, state, epoch: int, extra: Optional[dict] = None) -> None:
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state, "epoch": epoch}
    if extra:
        payload["extra"] = extra
    ckptr.save(_ckpt_dir(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, state_template, epoch: int = 0) -> tuple[Any, int]:
    """Restore (state, next_epoch); state_template provides the pytree
    structure/shapes."""
    ckptr = ocp.StandardCheckpointer()
    template = {"state": state_template, "epoch": epoch}
    restored = ckptr.restore(_ckpt_dir(path), template)
    return restored["state"], int(restored["epoch"])


def save_rng(path: str, rng_key: jax.Array, host_rng: np.random.Generator) -> None:
    """Write the serialized RNG state beside the Orbax checkpoint dir
    (`<path>.rng.npz`).  A sibling file — not a branch of the Orbax tree —
    so every existing consumer's restore template keeps matching, and
    pre-feature checkpoints stay loadable."""
    np.savez(_ckpt_dir(path) + ".rng.npz", **encode_rng(rng_key, host_rng))


def load_rng(path: str) -> Optional[tuple[jax.Array, np.random.Generator]]:
    """(rng_key, host_rng) from `<path>.rng.npz`, or None if the checkpoint
    predates deterministic resume."""
    fname = _ckpt_dir(path) + ".rng.npz"
    if not os.path.exists(fname):
        return None
    with np.load(fname) as z:
        return decode_rng({k: z[k] for k in z.files})


def save_params_only(path: str, params) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_ckpt_dir(path), {"params": params}, force=True)
    ckptr.wait_until_finished()


def load_params_only(path: str, params_template):
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(_ckpt_dir(path), {"params": params_template})
    return restored["params"]


def host_device_get(tree):
    return jax.tree.map(lambda x: jax.device_get(x), tree)


def load_encoder_checkpoint(path: str, state_template) -> Any:
    """Graft a checkpoint's ENCODER params/batch_stats into state_template,
    tolerating head/optimizer tree mismatches.

    The eval CLIs (linear.py, evaluate.py, extract_embeddings.py) only use
    the encoder, but a full-template restore fails on checkpoints written by
    the legacy DINO/BYOL-A trainers (DINOHead / projector+predictor trees,
    target_* state) — the reference's own eval loads just the backbone
    weights from any checkpoint (old/evaluate/linear.py's
    load_pretrained_weights).  Tries the exact full-state restore first (so
    a matching checkpoint also restores the head for e.g. probes that want
    it), then falls back to a template-free raw read + encoder graft."""
    try:
        state, _ = load_checkpoint(path, state_template)
        return state
    except Exception:
        pass
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(_ckpt_dir(path))
    src = raw.get("state", raw)
    enc_params = src["params"]["encoder"]
    enc_bs = (src.get("batch_stats") or {}).get("encoder", {})
    t_struct = jax.tree.structure(state_template.params["encoder"])
    s_struct = jax.tree.structure(
        jax.tree.map(lambda x: 0, enc_params))
    if t_struct != s_struct:
        raise ValueError(
            f"checkpoint encoder tree does not match the configured "
            f"model ({path}): {s_struct} vs {t_struct}")
    new_params = dict(state_template.params)
    new_params["encoder"] = jax.tree.map(jnp.asarray, enc_params)
    new_bs = dict(state_template.batch_stats or {})
    if enc_bs:
        new_bs["encoder"] = jax.tree.map(jnp.asarray, enc_bs)
    return state_template.replace(params=new_params, batch_stats=new_bs)
