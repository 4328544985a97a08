"""Decompose the Barlow-Twins training step's time by component (ceiling
analysis for PERF.md — VERDICT r1 #6).

Times, with the overhead-cancelling two-scan-length slope (see tools/mfu.py):
  fwd1    one encoder forward (train mode, no mask)
  fwd     full loss forward (2 views, heads, BT loss)
  grad    value_and_grad of the loss (fwd + bwd)
  step    the complete train step (augmentation + grad + optimizer)

    python tools/step_ablation.py --model vit_base --batch 128
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(make_scan, n, state, batch, reps=3):
    # state/batch are jit ARGUMENTS: closed-over weights become compile-time
    # constants and blow the remote-compile HTTP payload limit (413)
    import jax

    def run(nn):
        f = make_scan(nn)
        a = float(f(state, batch, jax.random.key(1)))
        best = float("inf")
        for r in range(reps):
            t0 = time.time()
            b = float(f(state, batch, jax.random.key(r + 2)))
            best = min(best, time.time() - t0)
            assert b != a
        return best

    t_n, t_2n = run(n), run(2 * n)
    return (t_2n - t_n) / n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vit_base")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--wav", action="store_true", default=False,
                   help="raw-waveform input: adds a 'frontend' row and runs "
                        "the full step in end-to-end wav mode")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.train.state import init_train_state
    from ssl_audio_tpu.train.steps import (_split_rngs, make_device_frontend,
                                           make_train_step)
    from ssl_audio_tpu.objectives.barlow import barlow_twins_loss

    cfg = default_config(
        model_type=args.model, batch_size=args.batch, mask=True,
        random_mask_ratio=False,
        mask_ratio=0.3 if "vit" in args.model else 0.0,
    )
    mods, state = init_train_state(cfg, jax.random.key(0), niter_per_ep=100)

    rng = np.random.default_rng(0)
    frontend = make_device_frontend(cfg, (-0.8294, 4.6230)) if args.wav else None
    if args.wav:
        batch = jnp.asarray(
            (rng.standard_normal((args.batch, 160_000)) * 0.1).astype(np.float32))
    else:
        batch = jnp.asarray(
            rng.standard_normal((args.batch, 1, cfg.n_mels, cfg.crop_frames))
            .astype(np.float32))

    def loss_fn(params, bs, views, ks, mask_ratio):
        enc_rngs = {"mask": ks["mask"], "dropout": ks["dropout"],
                    "droppath": ks["droppath"]}
        t_out, _ = mods.apply_encoder(
            params["encoder"], bs["encoder"], views[0], train=True,
            rngs=enc_rngs, mask_ratio=mask_ratio)
        t_z, _ = mods.apply_head(params["head"], bs["head"], t_out, train=True)
        t_z, _ = mods.apply_predictor(params["predictor"], bs["predictor"],
                                      t_z, train=True)
        s_out, _ = mods.apply_encoder(params["encoder"], bs["encoder"],
                                      views[1], train=True, rngs=enc_rngs)
        s_z, _ = mods.apply_head(params["head"], bs["head"], s_out, train=True)
        return barlow_twins_loss([s_z], [t_z], lmbda=cfg.lmbda,
                                 alpha=cfg.alpha, HSIC=cfg.HSIC)

    mask_ratio = jnp.float32(cfg.mask_ratio)
    step = make_train_step(mods, donate=False, frontend=frontend)

    def scan_over(fn):
        # fold a scalar from fn(st, b, key_i) every iteration
        def make(n):
            def scanned(st, b, key):
                def body(acc, i):
                    return acc + fn(st, b, jax.random.fold_in(key, i)), None
                out, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
                # key-dependent term so repeat calls with fresh keys can't be
                # memoized even when fn is deterministic in the key
                return out + jax.random.uniform(key) * 1e-6
            return jax.jit(scanned)
        return make

    def _lms(ks, b):
        return frontend(ks["frontend"], b) if frontend is not None else b

    def fwd1(st, b, key):
        ks = _split_rngs(key)
        enc_rngs = {"mask": ks["mask"], "dropout": ks["dropout"],
                    "droppath": ks["droppath"]}
        # key-dependent input: without this the whole forward is loop-
        # invariant and XLA HOISTS it out of the timing scan (measured
        # 0.61 ms for a 550-GFLOP forward)
        b = _lms(ks, b) * (1.0 + jax.random.uniform(ks["aug"]) * 1e-6)
        out, _ = mods.apply_encoder(
            st.params["encoder"], st.batch_stats["encoder"], b,
            train=True, rngs=enc_rngs)
        return out.mean()

    def front(st, b, key):
        ks = _split_rngs(key)
        return _lms(ks, b).mean()

    def aug(st, b, key):
        ks = _split_rngs(key)
        views, _ = mods.make_views(ks["aug"], _lms(ks, b), st.aug)
        return views[0].mean() + views[1].mean()

    def fwd(st, b, key):
        ks = _split_rngs(key)
        views, _ = mods.make_views(ks["aug"], _lms(ks, b), st.aug)
        return loss_fn(st.params, st.batch_stats, views, ks, mask_ratio)

    def grad(st, b, key):
        ks = _split_rngs(key)
        views, _ = mods.make_views(ks["aug"], _lms(ks, b), st.aug)
        l, g = jax.value_and_grad(loss_fn)(st.params, st.batch_stats,
                                           views, ks, mask_ratio)
        return l + jax.tree.reduce(
            lambda a, b_: a + b_, jax.tree.map(lambda x: x.mean(), g))

    # full step: thread the real TrainState through the scan
    def full_make(n):
        def scanned(st, b, key):
            def body(s, i):
                new_st, metrics = step(s, b, jax.random.fold_in(key, i),
                                       mask_ratio)
                return new_st, metrics["loss"]
            _, losses = lax.scan(body, st, jnp.arange(n))
            return losses.sum()
        return jax.jit(scanned)

    parts = ([("frontend", scan_over(front))] if args.wav else [])
    parts += [("fwd1", scan_over(fwd1)), ("aug", scan_over(aug)),
              ("fwd", scan_over(fwd)), ("grad", scan_over(grad)),
              ("step", full_make)]
    rows = {}
    for name, make in parts:
        dt = slope_time(make, args.n, state, batch)
        rows[name] = round(dt * 1e3, 2)
        print(f"{name:8s}: {dt*1e3:7.2f} ms")
    print(json.dumps({"model": args.model, "batch": args.batch, "ms": rows}))


if __name__ == "__main__":
    main()
