"""Train steps for the legacy-generation SSL objectives (SURVEY §2.2):

make_dino_train_step  — DINO (old/methods/dino.py): student gets all crops,
    EMA teacher gets the two global crops, centered/sharpened CE loss, center
    carried in the train state, teacher momentum schedule (clipping opt-in —
    the reference loop does not clip).
make_byola_train_step — BYOL-A (old/byola/byol_pytorch.py): online
    projector+predictor vs EMA target projector, symmetric normalized-MSE.

Both reuse the data-parallel design of the main steps: batch sharded over the
mesh, collectives via GSPMD (the reference's all-reduced DINO center update,
dino.py:380-383, is just the global batch mean here)."""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ssl_audio_tpu.models.wrapper import build_encoder, is_vit
from ssl_audio_tpu.objectives.byol import byol_loss_fn
from ssl_audio_tpu.objectives.dino import DINOHead, dino_loss
from ssl_audio_tpu.train.state import TrainState
from ssl_audio_tpu.augment.transforms import init_augment_state


class _MLPHead(nn.Module):
    """BYOL-A projector/predictor: Linear-BN-ReLU-Linear
    (byol_pytorch.py MLP)."""

    hidden_dim: int = 4096
    out_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim)(x)


class LegacyModules:
    """Encoder + method-specific heads for dino/byola."""

    def __init__(self, cfg, method: str):
        self.cfg = cfg
        self.method = method
        self.encoder, self.feature_dim = build_encoder(cfg)
        self.vit = is_vit(cfg)
        if method == "dino":
            # hidden/bottleneck stay the DINOHead class defaults (2048/256)
            # — the reference trainer only sets out_dim
            # (old/methods/dino.py:76-77, dino.yaml projection.out_dim)
            self.head = DINOHead(out_dim=cfg.dino_out_dim)
        elif method == "byola":
            # BYOL(projection_size=proj_size, projection_hidden_size=
            # proj_dim), old/byola/pretrain.py:116-125 + config.yaml
            self.head = _MLPHead(hidden_dim=cfg.proj_dim,
                                 out_dim=cfg.proj_size)
            self.predictor = _MLPHead(hidden_dim=cfg.proj_dim,
                                      out_dim=cfg.proj_size)
        else:
            raise ValueError(method)

    def encoder_fwd(self, params, bs, x, rngs=None):
        # --use_fp16: same AMP-style bfloat16 encoder forward as the main
        # path (train/state.py apply_encoder) — fp32 master params, heads
        # and losses kept in fp32
        fp16 = bool(getattr(self.cfg, "use_fp16", False))
        if fp16:
            params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
            x = x.astype(jnp.bfloat16)
        variables = {"params": params}
        if bs:
            variables["batch_stats"] = bs
        kwargs = {"mask_ratio": 0} if self.vit else {}
        out, mut = self.encoder.apply(
            variables, x, train=True, mutable=["batch_stats"], rngs=rngs, **kwargs
        )
        new_bs = mut.get("batch_stats", bs)
        if fp16:
            out = jax.tree.map(lambda o: o.astype(jnp.float32), out)
            if new_bs:
                new_bs = jax.tree.map(lambda s: s.astype(jnp.float32), new_bs)
        return out, new_bs

    def head_fwd(self, module, params, bs, x):
        variables = {"params": params}
        if bs:
            variables["batch_stats"] = bs
        out, mut = module.apply(variables, x, train=True, mutable=["batch_stats"])
        return out, mut.get("batch_stats", bs)

    def make_views(self, key, batch, aug_state):
        from ssl_audio_tpu.augment.transforms import make_pair_views

        return make_pair_views(key, batch, aug_state, self.cfg)


def init_legacy_state(cfg, rng, method: str, niter_per_ep: int = 100):
    mods = LegacyModules(cfg, method)
    ks = jax.random.split(rng, 4)
    sample = jnp.zeros((2, 1, cfg.n_mels, cfg.crop_frames), jnp.float32)
    enc_rngs = {"params": ks[0], "mask": ks[3], "dropout": ks[3], "droppath": ks[3]}
    enc_vars = mods.encoder.init(enc_rngs, sample, train=False)
    feat = jnp.zeros((2, mods.feature_dim), jnp.float32)
    head_vars = mods.head.init({"params": ks[1]}, feat, train=False)
    params = {"encoder": enc_vars["params"], "head": head_vars["params"],
              "predictor": {}}
    batch_stats = {"encoder": enc_vars.get("batch_stats", {}),
                   "head": head_vars.get("batch_stats", {}), "predictor": {}}
    if method == "byola":
        emb = jnp.zeros((2, cfg.proj_size), jnp.float32)
        pred_vars = mods.predictor.init({"params": ks[2]}, emb, train=False)
        params["predictor"] = pred_vars["params"]
        batch_stats["predictor"] = pred_vars.get("batch_stats", {})

    from ssl_audio_tpu.train import optim as optim_lib

    # the old-gen trainers carry their own optimizer recipes (AdamW +
    # cosine lr/wd for DINO, constant-lr Adam for BYOL-A) — NOT the
    # active tree's hyperparameters.py defaults
    tx = optim_lib.make_legacy_optimizer(cfg, method, niter_per_ep)
    mods.tx = tx
    target_params = jax.tree.map(jnp.array, params)
    target_bs = jax.tree.map(jnp.array, batch_stats)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        aug=init_augment_state(cfg),
        target_params=target_params,
        target_batch_stats=target_bs,
        extra={"center": jnp.zeros((1, cfg.dino_out_dim))}
        if method == "dino" else None,
    )
    return mods, state


def make_dino_train_step(mods: LegacyModules, clip_grad: float = None,
                         donate: bool = False):
    """DINO step: loss(student=all views, teacher=2 globals via EMA teacher);
    teacher momentum and teacher temperature are traced per-step scalars.

    clip_grad defaults to None for parity: the reference's old-gen DINO
    loop backprops without clipping (old/methods/dino.py:196-206); pass
    3.0 for the upstream DINO paper's recipe."""
    cfg = mods.cfg

    def step(state: TrainState, batch, key, teacher_temp, teacher_momentum):
        k_aug, k_enc = jax.random.split(key)
        views, aug_state = mods.make_views(k_aug, batch, state.aug)
        enc_rngs = {"mask": k_enc, "dropout": k_enc, "droppath": k_enc}

        def loss_fn(params):
            bs = state.batch_stats
            enc_bs, head_bs = bs["encoder"], bs["head"]
            student_zs = []
            for v in views:
                f, enc_bs = mods.encoder_fwd(params["encoder"], enc_bs, v, enc_rngs)
                z, head_bs = mods.head_fwd(mods.head, params["head"], head_bs, f)
                student_zs.append(z)

            t_enc_bs = state.target_batch_stats["encoder"]
            t_head_bs = state.target_batch_stats["head"]
            teacher_zs = []
            for v in views[:2]:
                f, t_enc_bs = mods.encoder_fwd(
                    state.target_params["encoder"], t_enc_bs, v, enc_rngs
                )
                z, t_head_bs = mods.head_fwd(
                    mods.head, state.target_params["head"], t_head_bs, f
                )
                teacher_zs.append(jax.lax.stop_gradient(z))

            loss, new_center = dino_loss(
                student_zs, teacher_zs, state.extra["center"], teacher_temp
            )
            new_bs = {"encoder": enc_bs, "head": head_bs, "predictor": bs["predictor"]}
            new_tbs = {"encoder": t_enc_bs, "head": t_head_bs,
                       "predictor": state.target_batch_stats["predictor"]}
            return loss, (new_center, new_bs, new_tbs)

        (loss, (center, new_bs, new_tbs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if clip_grad:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_grad / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = mods.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_target = optax.incremental_update(
            new_params, state.target_params, 1.0 - teacher_momentum
        )
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, aug=aug_state, target_params=new_target,
            target_batch_stats=new_tbs, extra={"center": center},
        )
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_byola_train_step(mods: LegacyModules, donate: bool = False):
    """BYOL-A step: symmetric normalized-MSE between online
    predictor(projector(f)) and EMA-target projector(f); target EMA'd with
    cfg.moving_average_decay."""
    cfg = mods.cfg
    beta = cfg.moving_average_decay

    def step(state: TrainState, batch, key, mask_ratio):
        k_aug, k_enc = jax.random.split(key)
        views, aug_state = mods.make_views(k_aug, batch, state.aug)
        enc_rngs = {"mask": k_enc, "dropout": k_enc, "droppath": k_enc}

        def one_side(params, bs, v, with_predictor):
            f, enc_bs = mods.encoder_fwd(params["encoder"], bs["encoder"], v, enc_rngs)
            z, head_bs = mods.head_fwd(mods.head, params["head"], bs["head"], f)
            pred_bs = bs["predictor"]
            if with_predictor:
                z, pred_bs = mods.head_fwd(mods.predictor, params["predictor"], pred_bs, z)
            return z, {"encoder": enc_bs, "head": head_bs, "predictor": pred_bs}

        def loss_fn(params):
            bs = state.batch_stats
            p1, bs = one_side(params, bs, views[0], True)
            p2, bs = one_side(params, bs, views[1], True)
            tbs = state.target_batch_stats
            t1, tbs = one_side(state.target_params, tbs, views[0], False)
            t2, tbs = one_side(state.target_params, tbs, views[1], False)
            t1, t2 = jax.lax.stop_gradient(t1), jax.lax.stop_gradient(t2)
            loss = (byol_loss_fn(p1, t2) + byol_loss_fn(p2, t1)).mean()
            return loss, (bs, tbs)

        (loss, (new_bs, new_tbs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = mods.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_target = optax.incremental_update(
            new_params, state.target_params, 1.0 - beta
        )
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, aug=aug_state, target_params=new_target,
            target_batch_stats=new_tbs,
        )
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())
