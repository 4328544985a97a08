"""Capture an XProf device trace of N train-step dispatches (pairs with
tools/trace_analysis.py).

    python tools/capture_trace.py --model audiontt --batch 256 --fused_conv \
        --out /tmp/xprof_fused
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="audiontt")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--use_fp16", action="store_true", default=False)
    p.add_argument("--fused_conv", action="store_true", default=False)
    p.add_argument("--fast_mel", action="store_true", default=False)
    p.add_argument("--fused_attention", action="store_true", default=None)
    p.add_argument("--no_fused_attention", dest="fused_attention",
                   action="store_false")
    p.add_argument("--token_drop", action="store_true", default=False)
    p.add_argument("--wav", action="store_true", default=False)
    p.add_argument("--scan", action="store_true", default=False)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.train.state import init_train_state
    from ssl_audio_tpu.train.steps import make_device_frontend, make_train_step

    cfg = default_config(
        model_type=args.model, batch_size=args.batch, mask=True,
        random_mask_ratio=False,
        mask_ratio=0.3 if "vit" in args.model else 0.0,
        use_fp16=args.use_fp16, fused_conv=args.fused_conv,
        fast_mel=args.fast_mel, fused_attention=args.fused_attention,
    )
    mods, state = init_train_state(cfg, jax.random.key(0), niter_per_ep=100)
    frontend = make_device_frontend(cfg, (-0.8294, 4.6230)) if args.wav else None
    step0 = make_train_step(mods, donate=False, frontend=frontend)

    len_keep = None
    if args.token_drop and "vit" in args.model and cfg.mask_ratio > 0:
        gh, gw = mods.encoder.grid_size()
        len_keep = int(np.floor(gh * gw * (1.0 - cfg.mask_ratio)))

    def step(st, batch, key, mr, _lk=len_keep):
        return step0(st, batch, key, mr, len_keep=_lk)

    rng = np.random.default_rng(0)
    if args.wav:
        batch = jnp.asarray(
            (rng.standard_normal((args.batch, 160_000)) * 0.1).astype(np.float32))
    else:
        batch = jnp.asarray(rng.standard_normal(
            (args.batch, 1, cfg.n_mels, cfg.crop_frames)).astype(np.float32))

    if args.scan:
        # N steps in one lax.scan (the exact program tools/mfu.py times) —
        # also dodges layouts that only compile in the scanned context
        from jax import lax

        def scanned(state, batch, key):
            def body(st, i):
                new_st, metrics = step(st, batch, jax.random.fold_in(key, i),
                                       jnp.float32(cfg.mask_ratio))
                return new_st, metrics["loss"]

            _, losses = lax.scan(body, state, jnp.arange(args.steps))
            return losses.sum()

        f = jax.jit(scanned)
        print("warm", float(f(state, batch, jax.random.key(1))))
        jax.profiler.start_trace(args.out)
        _ = float(f(state, batch, jax.random.key(2)))
        jax.profiler.stop_trace()
    else:
        # warm up / compile outside the trace window
        state, m = step(state, batch, jax.random.key(1),
                        jnp.float32(cfg.mask_ratio))
        print("warm loss", float(m["loss"]))
        jax.profiler.start_trace(args.out)
        for i in range(args.steps):
            state, m = step(state, batch, jax.random.key(2 + i),
                            jnp.float32(cfg.mask_ratio))
        _ = float(m["loss"])      # fetch barrier inside the window
        jax.profiler.stop_trace()
    print(f"trace with {args.steps} steps written to {args.out}")


if __name__ == "__main__":
    main()
