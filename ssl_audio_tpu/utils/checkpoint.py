"""Orbax checkpoint / resume (reference main.py:484-496, utils.py:37-46).

The whole TrainState (params, batch stats, optimizer state, augmentation ring
buffer, step) is one pytree with stable names — no DDP/MultiCrop prefix
surgery is ever needed on load (the reference's consumers strip
"backbone.encoder." prefixes by trial and error, linear.py:122-131)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


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
