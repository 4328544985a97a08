"""DINO collapse diagnostic (VERDICT r4 #1).

The r4 learning proof recorded loss ≡ ln(256) — the uniform fixed point of
the centered/sharpened CE (both teacher softmax and student softmax pinned
uniform).  This tool runs short DINO training and tracks the signals that
identify WHICH fixed point the dynamics sit at:

  * loss vs ln(out_dim)          — uniform collapse indicator
  * teacher/student entropy      — uniform => ln(out_dim); one-hot => 0
  * teacher logit batch std      — 0 => feature collapse (all inputs same)
  * center L2 / max-prob         — where the EMA center sits
  * bottleneck feature batch-std — collapse before vs after the head

Runs on CPU (forced) with small models/batches; the dynamics of
centering-vs-sharpening do not depend on scale.

    python tools/dino_diagnose.py --epochs 6 --steps 25 --batch 32 \
        --teacher_temp 0.4
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="audiontt")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out_dim", type=int, default=4096)
    p.add_argument("--teacher_temp", type=float, default=0.4)
    p.add_argument("--warmup_teacher_temp", type=float, default=0.04)
    p.add_argument("--warmup_teacher_temp_epochs", type=int, default=18)
    p.add_argument("--base_lr", type=float, default=None)
    p.add_argument("--momentum_teacher", type=float, default=0.996)
    p.add_argument("--center_momentum", type=float, default=0.9)
    p.add_argument("--cpu", action="store_true", default=True)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.data.datasets import SyntheticMultiCue
    from ssl_audio_tpu.data.pipeline import DataLoader
    from ssl_audio_tpu.objectives import dino as dino_lib
    from ssl_audio_tpu.train.legacy_steps import (
        LegacyModules, init_legacy_state, make_dino_train_step)
    from ssl_audio_tpu.utils.schedules import cosine_scheduler

    cfg = default_config(
        method="dino", model_type=args.model_type, batch_size=args.batch,
        epochs=args.epochs, dino_out_dim=args.out_dim,
        teacher_temp=args.teacher_temp,
        warmup_teacher_temp=args.warmup_teacher_temp,
        warmup_teacher_temp_epochs=args.warmup_teacher_temp_epochs,
        momentum_teacher=args.momentum_teacher,
        base_lr=args.base_lr,
        synthetic_steps_per_epoch=args.steps, no_eval=True,
    )
    ds = SyntheticMultiCue(cfg, length=args.steps * args.batch, seed=0)
    loader = DataLoader(ds, args.batch, shuffle=True, drop_last=True,
                        num_workers=0, seed=0)
    mods, state = init_legacy_state(cfg, jax.random.key(0), "dino",
                                    niter_per_ep=len(loader))
    step = make_dino_train_step(mods)
    temp_sched = dino_lib.teacher_temp_schedule(
        cfg.warmup_teacher_temp, cfg.teacher_temp,
        min(cfg.warmup_teacher_temp_epochs, cfg.epochs), cfg.epochs)
    mom_sched = cosine_scheduler(cfg.momentum_teacher, 1.0, cfg.epochs,
                                 len(loader))

    # --- probe: teacher/student logits + bottleneck feature on a fixed batch
    def probe(state, batch, key, temp):
        k_aug, k_enc = jax.random.split(key)
        views, _ = mods.make_views(k_aug, batch, state.aug)
        rngs = {"mask": k_enc, "dropout": k_enc, "droppath": k_enc}
        out = {}
        for tag, params, bstats in (
            ("student", state.params, state.batch_stats),
            ("teacher", state.target_params, state.target_batch_stats),
        ):
            f, _ = mods.encoder_fwd(params["encoder"], bstats["encoder"],
                                    views[0], rngs)
            z, _ = mods.head_fwd(mods.head, params["head"], bstats["head"], f)
            logits = z
            if tag == "teacher":
                probs = jax.nn.softmax(
                    (logits - state.extra["center"]) / temp, axis=-1)
            else:
                probs = jax.nn.softmax(logits / 0.1, axis=-1)
            ent = -(probs * jnp.log(probs.clip(1e-12))).sum(-1).mean()
            out[f"{tag}_entropy"] = float(ent)
            out[f"{tag}_logit_bstd"] = float(logits.std(axis=0).mean())
            out[f"{tag}_feat_bstd"] = float(f.std(axis=0).mean())
        out["center_l2"] = float(jnp.linalg.norm(state.extra["center"]))
        out["center_max"] = float(jnp.abs(state.extra["center"]).max())
        return out

    probe_j = probe  # eager: tiny fixed batch, float() extraction inside
    ln_out = float(np.log(args.out_dim))
    key = jax.random.key(1)
    fixed_batch = None
    rows = []
    for epoch in range(1, args.epochs + 1):
        loader.set_epoch(epoch)
        losses = []
        for i, (lms, _y) in enumerate(loader):
            key, k = jax.random.split(key)
            batch = jnp.asarray(lms)
            if fixed_batch is None:
                fixed_batch = batch
            it = (epoch - 1) * len(loader) + i
            state, m = step(state, batch, k,
                            np.float32(temp_sched[epoch - 1]),
                            np.float32(mom_sched[it]))
            losses.append(float(m["loss"]))
        d = probe_j(state, fixed_batch, jax.random.key(99),
                    np.float32(temp_sched[epoch - 1]))
        d = {k: round(float(v), 4) for k, v in d.items()}
        row = {"epoch": epoch, "loss": round(float(np.mean(losses)), 4),
               "temp": round(float(temp_sched[epoch - 1]), 4),
               "ln_out_dim": round(ln_out, 4), **d}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"args": vars(args), "rows": rows}, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
