"""Train state: everything a step carries, as one pytree.

The reference scatters this across the DDP module, optimizer, loss-BN buffers
and per-worker augmentation objects; here it is a single flax.struct dataclass
so the whole update is one jit-compiled function and one Orbax checkpoint.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ssl_audio_tpu.augment.transforms import AugmentState, init_augment_state
from ssl_audio_tpu.models.heads import BarlowTwinsHead, BarlowTwinsPredictor
from ssl_audio_tpu.models.wrapper import build_encoder, is_vit
from ssl_audio_tpu.train import optim as optim_lib


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any
    aug: Optional[AugmentState]
    # BYOL variant: target network (params + stats); None otherwise
    target_params: Optional[Dict[str, Any]] = None
    target_batch_stats: Optional[Dict[str, Any]] = None
    # objective-specific carried state (e.g. the DINO center); None otherwise
    extra: Optional[Dict[str, Any]] = None


class Modules:
    """Static bundle: encoder/head/predictor modules + cfg (not a pytree).

    `mesh` (optional): the training mesh — build_encoder routes the AudioNTT
    fused kernel through its shard_map form on multi-device data meshes."""

    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        self.encoder, self.feature_dim = build_encoder(cfg, mesh=mesh)
        self.head = BarlowTwinsHead(
            projector_n_hidden_layers=cfg.projector_n_hidden_layers,
            projector_hidden_dim=cfg.projector_hidden_dim,
            projector_out_dim=cfg.projector_out_dim,
        )
        self.predictor = BarlowTwinsPredictor(use=cfg.predictor)
        self.vit = is_vit(cfg)

    def encoder_kwargs(self, mask_ratio=0, masked_recon=False, len_keep=None):
        if self.vit:
            # mean_pool: reference ViT wrapper forwards use_mean_pool on every
            # call (model.py:121-127).  len_keep (static) selects the
            # token-drop fast path — the reference's own compute shape
            # (mae.py:330-346); see vit.prepare_tokens.
            return dict(mask_ratio=mask_ratio, masked_recon=masked_recon,
                        mean_pool=self.cfg.use_mean_pool, len_keep=len_keep)
        return {}

    def make_views(self, key, batch, aug_state):
        """Two (or 2+N) augmented views of a batch: the audio pipeline
        (AudioPairTransform) or the CIFAR pair transform, per dataset."""
        if self.cfg.dataset == "cifar10":
            from ssl_audio_tpu.augment.cifar import cifar_pair_views

            v1, v2 = cifar_pair_views(key, batch)
            return [v1, v2], aug_state
        from ssl_audio_tpu.augment.transforms import make_pair_views

        return make_pair_views(key, batch, aug_state, self.cfg)

    def apply_encoder(
        self, params, batch_stats, x, train, rngs=None,
        mask_ratio=0, masked_recon=False, len_keep=None,
    ):
        """Returns (output, new_batch_stats); output is (latent, recon_loss)
        when masked_recon.

        With cfg.use_fp16 the encoder forward runs in bfloat16 (params + input
        cast; outputs cast back to fp32) — the TPU analog of the reference's
        torch.cuda.amp.autocast (main.py:84), with fp32 master params and the
        head/loss kept in fp32."""
        if self.cfg.use_fp16:
            params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
            x = x.astype(jnp.bfloat16)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mut = self.encoder.apply(
            variables, x, train=train,
            mutable=["batch_stats"], rngs=rngs,
            **self.encoder_kwargs(mask_ratio, masked_recon, len_keep),
        )
        if self.cfg.use_fp16:
            out = jax.tree.map(lambda o: o.astype(jnp.float32), out)
        new_bs = mut.get("batch_stats", batch_stats)
        if self.cfg.use_fp16 and new_bs:
            new_bs = jax.tree.map(lambda s: s.astype(jnp.float32), new_bs)
        return out, new_bs

    def apply_head(self, params, batch_stats, x, train):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mut = self.head.apply(variables, x, train=train, mutable=["batch_stats"])
        return out, mut.get("batch_stats", batch_stats)

    def apply_predictor(self, params, batch_stats, x, train):
        if not self.cfg.predictor:
            return x, batch_stats
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mut = self.predictor.apply(variables, x, train=train, mutable=["batch_stats"])
        return out, mut.get("batch_stats", batch_stats)


def init_train_state(
    cfg, rng: jax.Array, niter_per_ep: int = 100, byol: bool = False,
    mesh=None,
) -> tuple[Modules, TrainState]:
    mods = Modules(cfg, mesh=mesh)
    k_enc, k_head, k_pred, k_extra = jax.random.split(rng, 4)
    if cfg.dataset == "cifar10":
        sample = jnp.zeros((2, 3, 32, 32), jnp.float32)
    else:
        sample = jnp.zeros((2, 1, cfg.n_mels, cfg.crop_frames), jnp.float32)

    enc_rngs = {"params": k_enc, "mask": k_extra, "dropout": k_extra, "droppath": k_extra}
    enc_vars = mods.encoder.init(
        enc_rngs, sample, train=False,
        **mods.encoder_kwargs(masked_recon=cfg.masked_recon),
    )
    feat = jnp.zeros((2, mods.feature_dim), jnp.float32)
    head_vars = mods.head.init({"params": k_head}, feat, train=False)
    emb = jnp.zeros((2, cfg.projector_out_dim), jnp.float32)
    if cfg.predictor:
        pred_vars = mods.predictor.init({"params": k_pred}, emb, train=False)
    else:
        pred_vars = {"params": {}}

    params = {
        "encoder": enc_vars["params"],
        "head": head_vars["params"],
        "predictor": pred_vars.get("params", {}),
    }
    batch_stats = {
        "encoder": enc_vars.get("batch_stats", {}),
        "head": head_vars.get("batch_stats", {}),
        "predictor": pred_vars.get("batch_stats", {}),
    }
    aug = init_augment_state(cfg)

    target_params = None
    target_bs = None
    if byol:
        # target initialized from online (main_bt_byol.py:428); materialized
        # as distinct buffers so jit donation never sees aliased arguments
        target_params = jax.tree.map(lambda x: jnp.array(x), params)
        target_bs = jax.tree.map(lambda x: jnp.array(x), batch_stats)

    if byol and not cfg.stop_gradient:
        # target trains by gradient and shares the optimizer
        # (main_bt_byol.py:302-306): one opt_state over both trees
        opt_params = (params, target_params)
    else:
        opt_params = params
    tx = optim_lib.make_optimizer(cfg, opt_params, niter_per_ep)
    opt_state = tx.init(opt_params)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        aug=aug,
        target_params=target_params,
        target_batch_stats=target_bs,
    )
    mods.tx = tx
    return mods, state
