"""Training-step efficiency: ms/step, achieved FLOP/s and MFU for the full
Barlow-Twins update, with a batch-size sweep (VERDICT r1 #6; the reference
publishes no equivalent — BASELINE.json's steps/sec @ ViT-B is the metric).

Methodology (PERF.md): N steps inside ONE lax.scan threading the TrainState,
scalar loss-sum fetched to host as the barrier — dispatch-loop timing lies on
this backend.  Two scan lengths (N and 2N) are timed and the per-step time is
the SLOPE (t_2N - t_N) / N, which cancels the fixed per-call dispatch+fetch
overhead of the remote tunnel (~10-40 ms/call).  FLOPs come from XLA's cost
analysis of ONE un-scanned compiled step — cost_analysis() counts a scan body
once regardless of trip count, so analysing the scan and dividing by N
undercounts by N (measured: a 10-iteration matmul scan reports exactly one
matmul's FLOPs).  MFU = logical FLOP/s / peak bf16 FLOP/s.

    python tools/mfu.py --models vit_base audiontt --batches 128 256
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# peak dense bf16 FLOP/s per chip (MXU); override with --peak_tflops
PEAK_TFLOPS = {"tpu": 197.0, "cpu": 1.0}  # v5e: 197 TF bf16


def _setup(model_type: str, batch_size: int, n_steps: int = 10,
           use_fp16: bool = False, token_drop: bool = False,
           wav: bool = False, fused_conv: bool = False,
           fast_mel: bool = False, pool_reorder=None,
           fused_attention=None, layout_barrier=None,
           patch_size=(16, 16)):
    """Build the scanned step fns for one config: returns
    (fns {n: jitted}, call_args, flops_per_step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.train.state import init_train_state
    from ssl_audio_tpu.train.steps import make_device_frontend, make_train_step

    cfg = default_config(
        model_type=model_type, batch_size=batch_size, mask=True,
        random_mask_ratio=False, mask_ratio=0.3 if "vit" in model_type else 0.0,
        use_fp16=use_fp16, fused_conv=fused_conv, fast_mel=fast_mel,
        pool_reorder=pool_reorder, fused_attention=fused_attention,
        layout_barrier=layout_barrier,
        patch_size=list(patch_size),
    )
    mods, state = init_train_state(cfg, jax.random.key(0), niter_per_ep=100)
    # --wav: the full end-to-end step — raw 10-s waveforms in, mel + crop +
    # normalize + augment + BT update all inside the one jit
    frontend = make_device_frontend(cfg, (-0.8294, 4.6230)) if wav else None
    step = make_train_step(mods, donate=False, frontend=frontend)

    len_keep = None
    if token_drop and "vit" in model_type and cfg.mask_ratio > 0:
        import numpy as _np

        gh, gw = mods.encoder.grid_size()
        len_keep = int(_np.floor(gh * gw * (1.0 - cfg.mask_ratio)))

    def make_scanned(n):
        def scanned(state, batch, key):
            def body(st, i):
                new_st, metrics = step(
                    st, batch, jax.random.fold_in(key, i),
                    jnp.float32(cfg.mask_ratio), len_keep=len_keep,
                )
                return new_st, metrics["loss"]

            final, losses = lax.scan(body, state, jnp.arange(n))
            return losses.sum()

        return jax.jit(scanned)

    rng = np.random.default_rng(0)
    if wav:
        batch = jnp.asarray(
            (rng.standard_normal((batch_size, 160_000)) * 0.1).astype(np.float32)
        )
    else:
        batch = jnp.asarray(
            rng.standard_normal((batch_size, 1, cfg.n_mels, cfg.crop_frames))
            .astype(np.float32)
        )

    # per-step logical FLOPs from ONE un-scanned step (see module docstring).
    # The new state MUST be a live output — returning only the loss lets XLA
    # dead-code-eliminate the entire backward pass + optimizer update
    # (measured: loss-only lowering reports ~1/3 the FLOPs, i.e. forward only).
    one = jax.jit(lambda st, b, k: step(st, b, k, jnp.float32(cfg.mask_ratio),
                                        len_keep=len_keep))
    cost = one.lower(state, batch, jax.random.key(1)).compile().cost_analysis() or {}
    flops_per_step = float(cost.get("flops", -1.0))

    from ssl_audio_tpu.config import config_fingerprint

    fns = {n: make_scanned(n) for n in (n_steps, 2 * n_steps)}
    meta = {
        "model": model_type, "batch": batch_size,
        "use_fp16": use_fp16, "token_drop": len_keep is not None, "wav": wav,
        "fused_conv": fused_conv, "pool_reorder": pool_reorder,
        "fused_attention": fused_attention,
        "layout_barrier": layout_barrier,
        # config identity stamp (VERDICT r4 #7)
        "config_hash": config_fingerprint(cfg)[1],
    }
    return fns, (state, batch), flops_per_step, meta


def _time_interleaved(variants, n_steps, reps):
    """variants: {name: (fns, call_args)}.  Warm every (variant, scan-length)
    fn once, then INTERLEAVE timed reps across ALL of them (v1:n, v1:2n,
    v2:n, v2:2n, ...) so chip/tunnel throughput drift — minutes of compile
    apart in a sequential order — hits every arm equally (2026-08-19:
    sequential-phase runs of identical code spread 10.5–15.5 ms/step under a
    congested tunnel).  Returns {name: (per_step, call_overhead, warm_s)}."""
    import jax

    warms, best = {}, {}
    for name, (fns, call_args) in variants.items():
        for n, f in fns.items():
            t0 = time.time()
            float(f(*call_args, jax.random.key(1)))
            warms[(name, n)] = time.time() - t0
            best[(name, n)] = float("inf")
    for rep in range(reps):
        for name, (fns, call_args) in variants.items():
            for n, f in fns.items():
                t0 = time.time()
                float(f(*call_args, jax.random.key(rep + 2)))
                best[(name, n)] = min(best[(name, n)], time.time() - t0)
    out = {}
    for name, (fns, _) in variants.items():
        ns = sorted(fns)
        t_n, t_2n = best[(name, ns[0])], best[(name, ns[1])]
        per_step = (t_2n - t_n) / n_steps          # overhead-free slope
        call_overhead = t_n - n_steps * per_step   # fixed dispatch+fetch
        out[name] = (per_step, call_overhead,
                     warms[(name, ns[0])] + warms[(name, ns[1])])
    return out


def _row(meta, flops_per_step, per_step, call_overhead, warm_s):
    return dict(
        meta,
        ms_per_step=round(per_step * 1e3, 2),
        steps_per_sec=round(1.0 / per_step, 2),
        samples_per_sec=round(meta["batch"] / per_step, 1),
        call_overhead_ms=round(call_overhead * 1e3, 1),
        gflops_per_step=round(flops_per_step / 1e9, 1),
        achieved_tflops=round(flops_per_step / per_step / 1e12, 2),
        warmup_s=round(warm_s, 1),
    )


def measure(model_type: str, batch_size: int, n_steps: int = 10,
            reps: int = 3, **kw):
    fns, call_args, flops, meta = _setup(
        model_type, batch_size, n_steps=n_steps, **kw)
    timed = _time_interleaved({"_": (fns, call_args)}, n_steps, reps)
    return _row(meta, flops, *timed["_"])


def measure_ab(model_type: str, batch_size: int, ab_field: str, ab_values,
               n_steps: int = 10, reps: int = 3, **kw):
    """Same-process interleaved A/B over one config field: both variants'
    scans compiled up front, timed reps interleaved across variants AND scan
    lengths — the only comparison that survives tunnel drift."""
    variants, metas, flops = {}, {}, {}
    for v in ab_values:
        kw2 = dict(kw, **{ab_field: v})
        fns, call_args, fl, meta = _setup(
            model_type, batch_size, n_steps=n_steps, **kw2)
        name = f"{ab_field}={v}"
        variants[name] = (fns, call_args)
        metas[name], flops[name] = meta, fl
    timed = _time_interleaved(variants, n_steps, reps)
    return [_row(metas[n], flops[n], *timed[n]) for n in timed]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", default=["vit_base", "audiontt"])
    p.add_argument("--batches", nargs="+", type=int, default=[128])
    p.add_argument("--n_steps", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--use_fp16", action="store_true", default=False)
    p.add_argument("--token_drop", action="store_true", default=False)
    p.add_argument("--wav", action="store_true", default=False)
    p.add_argument("--fused_conv", action="store_true", default=False)
    p.add_argument("--patch_size", nargs="+", type=int, default=[16, 16])
    p.add_argument("--pool_reorder", action="store_true", default=None)
    p.add_argument("--no_pool_reorder", dest="pool_reorder",
                   action="store_false")
    p.add_argument("--fast_mel", action="store_true", default=False)
    p.add_argument("--fused_attention", action="store_true", default=None)
    p.add_argument("--no_fused_attention", dest="fused_attention",
                   action="store_false")
    p.add_argument("--layout_barrier", action="store_true", default=None)
    p.add_argument("--no_layout_barrier", dest="layout_barrier",
                   action="store_false")
    # interleaved same-process A/B over layout_barrier on|off (the only
    # trustworthy comparison on drift-prone days — CLAUDE.md)
    p.add_argument("--ab_layout_barrier", action="store_true", default=False)
    # generic same-process A/B over any boolean config field (e.g.
    # --ab use_fp16 for the vit_tiny bf16-slower question, VERDICT r4 #3b)
    p.add_argument("--ab", type=str, default=None)
    p.add_argument("--peak_tflops", type=float, default=None)
    p.add_argument("--out", type=str, default="mfu_results.json")
    args = p.parse_args(argv)

    import jax

    backend = jax.default_backend()
    peak = args.peak_tflops or PEAK_TFLOPS.get(backend, 197.0)
    print(f"backend={backend} peak={peak} TFLOP/s (bf16)")

    kw = dict(use_fp16=args.use_fp16,
              token_drop=args.token_drop, wav=args.wav,
              fused_conv=args.fused_conv, fast_mel=args.fast_mel,
              pool_reorder=args.pool_reorder,
              fused_attention=args.fused_attention,
              patch_size=tuple(args.patch_size))
    rows = []
    for model in args.models:
        for b in args.batches:
            if args.ab_layout_barrier:
                rs = measure_ab(model, b, "layout_barrier", [False, True],
                                n_steps=args.n_steps, reps=args.reps, **kw)
            elif args.ab:
                kw_ab = {k: v for k, v in kw.items() if k != args.ab}
                rs = measure_ab(model, b, args.ab, [False, True],
                                n_steps=args.n_steps, reps=args.reps,
                                layout_barrier=args.layout_barrier, **kw_ab)
            else:
                rs = [measure(model, b, n_steps=args.n_steps, reps=args.reps,
                              layout_barrier=args.layout_barrier, **kw)]
            for r in rs:
                r["mfu_pct"] = round(100.0 * r["achieved_tflops"] / peak, 2)
                rows.append(r)
                print(json.dumps(r))
    with open(args.out, "w") as f:
        json.dump({"backend": backend, "peak_tflops": peak, "rows": rows}, f,
                  indent=2)
    return rows


if __name__ == "__main__":
    main()
