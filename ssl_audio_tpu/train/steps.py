"""Jit-compiled training steps.

One function = the reference's whole per-iteration hot loop (main.py:46-169):
on-device two-view augmentation, teacher/student forwards, psum'd Barlow-Twins
loss, backward, optimizer update.  Data parallelism comes from sharding the
batch leading axis over the 'data' mesh; GSPMD inserts every collective.

make_train_step        — teacher/student BT (main.py semantics)
make_byol_train_step   — online/target BT with EMA target (main_bt_byol.py)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ssl_audio_tpu.objectives.barlow import barlow_twins_loss
from ssl_audio_tpu.train.state import Modules, TrainState


def _split_rngs(key, names=("aug", "mask", "dropout", "droppath", "frontend")):
    keys = jax.random.split(key, len(names))
    ks = dict(zip(names, keys))
    # dropout/droppath masks are the one place the step generates MILLIONS of
    # random bits (AudioNTT: 12.6M/view for the MLP hidden) — threefry mask
    # generation fused into the Dense GEMMs measured 1.17 ms/step at B=256
    # (tools/dropout_ablation.py, 2026-08-17).  RBG is the TPU's hardware
    # generator (XLA RngBitGenerator): same Bernoulli semantics, different
    # (still deterministic, key-derived) draws — the reference makes no
    # reproducibility promise across frameworks for dropout patterns.
    for name in ("dropout", "droppath"):
        kd = jax.random.key_data(ks[name])
        ks[name] = jax.random.wrap_key_data(
            jnp.concatenate([kd, kd]), impl="rbg")
    return ks


def _view_rngs(ks, i: int):
    """Independent rng streams for the i-th encoder forward of a step.

    flax's make_rng re-folds from the PASSED key on every apply(), so reusing
    one rng dict across per-view encoder calls would give every view the SAME
    token-mask noise and dropout pattern — unlike the reference, whose
    MultiCropWrapper concatenates same-resolution crops into one (nB, ...)
    forward (utils.py:94-133) so random_masking draws distinct noise rows per
    crop and torch dropout advances a global RNG between calls."""
    return {k: jax.random.fold_in(ks[k], i)
            for k in ("mask", "dropout", "droppath")}


def init_monitor():
    """Device-side training monitor: running finite-flag + loss accumulator.

    The reference checks `math.isfinite(loss.item())` every step
    (main.py:128-130) — a host sync per iteration.  Here the check is folded
    into the jitted step and carried across steps, so fetching the monitor at
    step k reports any NaN since the last fetch (and the true summed loss)
    without ever forcing an extra device sync."""
    return {
        "finite": jnp.bool_(True),
        "loss_sum": jnp.float32(0.0),
        "count": jnp.int32(0),
    }


def _fold_monitor(monitor, loss):
    return {
        "finite": monitor["finite"] & jnp.isfinite(loss),
        "loss_sum": monitor["loss_sum"] + loss,
        "count": monitor["count"] + 1,
    }


def make_device_frontend(cfg, norm_stats):
    """wav (B, L) -> normalized log-mel crops (B, 1, n_mels, crop_frames),
    entirely on device — the TPU-native replacement for the reference's
    host-side wav decode + mel + crop (datasets.py:98-119).  Inside the same
    jit as the train step, XLA hoists the crop above the DFT so only the
    cropped frames are transformed."""
    from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram_cropped

    spec = MelSpec.from_config(cfg)
    mean, std = norm_stats

    def frontend(key, wavs):
        n_frames = spec.num_frames(wavs.shape[-1])
        B = wavs.shape[0]
        out_frames = min(cfg.crop_frames, n_frames)
        # inclusive upper bound: valid starts are 0..n_frames-crop_frames —
        # the reference's lms crop is random.randint(0, length_adj), both
        # ends inclusive (datasets.py:112); jax randint's maxval is exclusive
        hi = max(n_frames - cfg.crop_frames + 1, 1)
        starts = jax.random.randint(key, (B,), 0, hi)
        # explicit crop-before-transform: only out_frames frames per clip hit
        # the DFT (XLA cannot hoist the crop through a gradient graph)
        lms = log_mel_spectrogram_cropped(
            wavs, spec, starts, out_frames,
            fast=bool(getattr(cfg, "fast_mel", False)))[:, None]
        if n_frames < cfg.crop_frames:
            lms = jnp.pad(
                lms, ((0, 0), (0, 0), (0, 0), (0, cfg.crop_frames - n_frames))
            )
        return (lms - mean) / std

    return frontend


def make_train_step(mods: Modules, world_scale: float = 1.0, donate: bool = True,
                    frontend=None, raw: bool = False):
    """Returns train_step(state, batch, key, mask_ratio) -> (state, metrics).

    batch: (B, 1, n_mels, crop_frames) pre-normalized log-mels (the
    reference's DataLoader output before AudioPairTransform) — or raw
    (B, n_samples) waveforms when `frontend` (make_device_frontend) is given.
    mask_ratio: traced scalar (schedule / random / fixed, main.py:72-81).
    """
    cfg = mods.cfg

    def train_step(state: TrainState, batch: jnp.ndarray, key: jax.Array, mask_ratio,
                   monitor=None, len_keep=None):
        ks = _split_rngs(key)
        if frontend is not None:
            batch = frontend(ks["frontend"], batch)
        views, aug_state = mods.make_views(ks["aug"], batch, state.aug)

        def loss_fn(params):
            bs = state.batch_stats
            # --- teacher: first global crop, masked, head + predictor ------
            # len_keep (STATIC, = int(L*(1-mask_ratio))) selects the
            # token-drop fast path: the masked forward runs on 1+len_keep
            # tokens instead of 1+L with -inf key biases — identical kept-
            # token outputs, ~(1 - len_keep/L) less teacher compute
            t_out, enc_bs = mods.apply_encoder(
                params["encoder"], bs["encoder"], views[0], train=True,
                rngs=_view_rngs(ks, 0), mask_ratio=mask_ratio,
                masked_recon=cfg.masked_recon, len_keep=len_keep,
            )
            recon_loss = jnp.float32(0.0)
            if cfg.masked_recon:
                t_out, recon_loss = t_out
            t_z, head_bs = mods.apply_head(params["head"], bs["head"], t_out, train=True)
            t_z, pred_bs = mods.apply_predictor(
                params["predictor"], bs["predictor"], t_z, train=True
            )

            # --- student: second global crop + locals, unmasked ------------
            student_zs = []
            for i, v in enumerate(views[1:]):
                s_out, enc_bs = mods.apply_encoder(
                    params["encoder"], enc_bs, v, train=True,
                    rngs=_view_rngs(ks, 1 + i),
                )
                s_z, head_bs = mods.apply_head(params["head"], head_bs, s_out, train=True)
                if cfg.stop_gradient:
                    s_z = jax.lax.stop_gradient(s_z)
                student_zs.append(s_z)

            bt = barlow_twins_loss(
                student_zs, [t_z],
                lmbda=cfg.lmbda, alpha=cfg.alpha, HSIC=cfg.HSIC,
                world_scale=world_scale,
            )
            total = bt + recon_loss
            new_bs = {"encoder": enc_bs, "head": head_bs, "predictor": pred_bs}
            return total, (bt, recon_loss, new_bs)

        (loss, (bt, recon, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = mods.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            aug=aug_state,
        )
        metrics = {"loss": loss, "bt_loss": bt, "recon_loss": recon}
        if monitor is None:
            return new_state, metrics
        return new_state, metrics, _fold_monitor(monitor, loss)

    if raw:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   static_argnames=("len_keep",))


def make_byol_train_step(mods: Modules, world_scale: float = 1.0, donate: bool = True,
                         frontend=None, raw: bool = False):
    """BYOL-style variant (main_bt_byol.py:40-166): online encoder takes both
    global crops (masked) + predictor; target encoder takes all crops; loss
    pairs skip same indices (ngcrops_each=2).  With --stop_gradient the
    target is frozen and EMA-updated from the online net before each
    optimizer step (main_bt_byol.py:121-126); otherwise the target trains by
    gradient alongside the online net."""
    cfg = mods.cfg
    beta = cfg.moving_average_decay

    def train_step(state: TrainState, batch: jnp.ndarray, key: jax.Array, mask_ratio,
                   monitor=None, len_keep=None):
        ks = _split_rngs(key)
        if frontend is not None:
            batch = frontend(ks["frontend"], batch)
        views, aug_state = mods.make_views(ks["aug"], batch, state.aug)

        def loss_fn(params, target_params):
            bs = state.batch_stats
            tbs = state.target_batch_stats
            recon_loss = jnp.float32(0.0)
            # online: both global crops, masked — per-view rngs so the two
            # crops get INDEPENDENT mask noise (the reference's concatenated
            # 2B forward draws distinct noise rows per crop)
            online_zs = []
            enc_bs, head_bs, pred_bs = bs["encoder"], bs["head"], bs["predictor"]
            for i, v in enumerate(views[:2]):
                o_out, enc_bs = mods.apply_encoder(
                    params["encoder"], enc_bs, v, train=True,
                    rngs=_view_rngs(ks, i),
                    mask_ratio=mask_ratio, masked_recon=cfg.masked_recon,
                    len_keep=len_keep,
                )
                if cfg.masked_recon:
                    o_out, rl = o_out
                    # reference passes both crops through ONE backbone call,
                    # so its recon loss is the mean over both (MultiCropWrapper
                    # accumulates per resolution group only) — average here
                    recon_loss = recon_loss + rl / 2.0
                o_z, head_bs = mods.apply_head(params["head"], head_bs, o_out, train=True)
                online_zs.append(o_z)
            # predictor over the concatenation (reference ncrops=1:
            # main_bt_byol.py:92-96 -> BN over both crops at once)
            cat = jnp.concatenate(online_zs, axis=0)
            cat, pred_bs = mods.apply_predictor(params["predictor"], pred_bs, cat, train=True)
            online_zs = list(jnp.split(cat, 2, axis=0))

            # target: all crops, unmasked
            target_zs = []
            t_enc_bs, t_head_bs = tbs["encoder"], tbs["head"]
            for i, v in enumerate(views):
                t_out, t_enc_bs = mods.apply_encoder(
                    target_params["encoder"], t_enc_bs, v, train=True,
                    rngs=_view_rngs(ks, 2 + i),
                )
                t_z, t_head_bs = mods.apply_head(
                    target_params["head"], t_head_bs, t_out, train=True
                )
                if cfg.stop_gradient:
                    t_z = jax.lax.stop_gradient(t_z)
                target_zs.append(t_z)

            bt = barlow_twins_loss(
                online_zs, target_zs[:2],
                lmbda=cfg.lmbda, alpha=cfg.alpha, HSIC=cfg.HSIC,
                world_scale=world_scale,
            )
            total = bt + recon_loss
            new_bs = {"encoder": enc_bs, "head": head_bs, "predictor": pred_bs}
            new_tbs = {"encoder": t_enc_bs, "head": t_head_bs, "predictor": tbs["predictor"]}
            return total, (bt, recon_loss, new_bs, new_tbs)

        if cfg.stop_gradient:
            (loss, (bt, recon, new_bs, new_tbs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.target_params)
            # EMA target update before the optimizer step (main_bt_byol.py:121-126)
            new_target = optax.incremental_update(
                state.params, state.target_params, 1.0 - beta
            )
            updates, new_opt = mods.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
        else:
            # target trains by gradient too; it shares the one optimizer, as
            # the reference extends the param groups (main_bt_byol.py:302-306)
            (loss, (bt, recon, new_bs, new_tbs)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.target_params)
            both = (state.params, state.target_params)
            updates, new_opt = mods.tx.update(grads, state.opt_state, both)
            new_params, new_target = optax.apply_updates(both, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            aug=aug_state,
            target_params=new_target,
            target_batch_stats=new_tbs,
        )
        metrics = {"loss": loss, "bt_loss": bt, "recon_loss": recon}
        if monitor is None:
            return new_state, metrics
        return new_state, metrics, _fold_monitor(monitor, loss)

    if raw:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   static_argnames=("len_keep",))


def make_multi_train_step(mods: Modules, n_steps: int, world_scale: float = 1.0,
                          donate: bool = True, frontend=None, byol: bool = False):
    """N train steps in ONE dispatch via lax.scan (--steps_per_dispatch).

    Real training loops dispatch step-by-step; each dispatch carries a fixed
    host/runtime cost (~25-30 ms through this machine's remote tunnel,
    ~0.1-1 ms on a locally-attached TPU — still significant against a
    15-40 ms step at scale).  Scanning N steps per dispatch amortizes it N×.

    Takes stacked inputs: batches (N, B, ...), keys (N,), mask_ratios (N,).
    len_keep is static per dispatch window (quantized from the window's
    first mask ratio — the sine schedule moves a fraction of a token per
    window).  Returns (state, stacked metrics, monitor)."""
    factory = make_byol_train_step if byol else make_train_step
    step = factory(mods, world_scale=world_scale, donate=False,
                   frontend=frontend, raw=True)

    def multi_step(state: TrainState, batches, keys, mask_ratios, monitor,
                   len_keep=None):
        def body(carry, inp):
            st, mon = carry
            b, k, mr = inp
            st, metrics, mon = step(st, b, k, mr, mon, len_keep=len_keep)
            return (st, mon), metrics

        (state, monitor), metrics = jax.lax.scan(
            body, (state, monitor), (batches, keys, mask_ratios))
        return state, metrics, monitor

    return jax.jit(multi_step, donate_argnums=(0,) if donate else (),
                   static_argnames=("len_keep",))


def make_forward_fn(mods: Modules, train: bool = False):
    """Jitted embedding forward (for eval/kNN/linear probing)."""

    @functools.partial(jax.jit, static_argnums=())
    def forward(params, batch_stats, x):
        out, _ = mods.apply_encoder(params["encoder"], batch_stats["encoder"], x, train=train)
        return out

    return forward
