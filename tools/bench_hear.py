"""HEAR 2021 inference API throughput (the torch-facing surface, end to end).

Times get_scene_embeddings / get_timestamp_embeddings over a batch of
10-second clips, including every host<->device transfer the API performs —
this is the contract a heareval harness sees, so wall-clock (not device
slope) is the right meter.  Repeats with DIFFERENT audio each call so the
backend's identical-input memoization can't fake the numbers.

    python tools/bench_hear.py --module conv --model audiontt --fast_mel
    python tools/bench_hear.py --module vit --model vitc_base
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--module", choices=["vit", "conv"], default="conv")
    p.add_argument("--model", default="audiontt")
    p.add_argument("--n_clips", type=int, default=64)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--fast_mel", action="store_true", default=False)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--fetch_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fused_conv", action="store_true", default=None)
    p.add_argument("--no_fused_conv", dest="fused_conv", action="store_false")
    p.add_argument("--pool_reorder", action="store_true", default=None)
    p.add_argument("--no_pool_reorder", dest="pool_reorder",
                   action="store_false")
    # --device_only: time the timestamp pipeline's DEVICE compute with a
    # scalar-checksum fetch, excluding the ~160 MB embedding download that
    # dominates end-to-end wall clock through a remote-attached tunnel
    # (irrelevant on locally-attached chips)
    p.add_argument("--device_only", action="store_true", default=False)
    args = p.parse_args(argv)

    import numpy as np
    import torch

    if args.module == "conv":
        from ssl_audio_tpu.hear import conv as mod

        model = mod.load_model("", args.model, fast_mel=args.fast_mel,
                               fetch_dtype=args.fetch_dtype,
                               fused_conv=args.fused_conv,
                               pool_reorder=args.pool_reorder,
                               compute_dtype=args.compute_dtype)
    else:
        from ssl_audio_tpu.hear import vit as mod

        model = mod.load_model("", args.model, fetch_dtype=args.fetch_dtype,
                               fast_mel=args.fast_mel,
                               compute_dtype=args.compute_dtype)

    sr = model.sample_rate
    n = int(args.seconds * sr)
    rng = np.random.default_rng(0)

    def clips(seed):
        return torch.from_numpy(
            (rng.standard_normal((args.n_clips, n)) * 0.1).astype(np.float32))

    if args.device_only:
        import jax.numpy as jnp

        from ssl_audio_tpu.hear.vit import (
            _frame_audio_on_device,
            _timestamp_pipeline,
        )

        if args.module == "conv":
            bf16c = args.compute_dtype == "bfloat16"

            def encode_fn(variables, m):
                if bf16c:
                    m = m.astype(jnp.bfloat16)
                return model.model.apply(variables, m,
                                         train=False).astype(jnp.float32)
        else:
            encode_fn = None
        cfg = model.cfg
        frame_size = int((mod.TIMESTAMP_FRAME_DUR / 1000) * cfg.sample_rate)

        def stage(a):
            """Upload + frame OUTSIDE the timed region, with a real fetch
            barrier — block_until_ready can return before the remote upload
            completes on this backend, so only a scalar fetch proves the
            windows are resident."""
            flat, _ts, N = _frame_audio_on_device(
                np.asarray(a), frame_size, mod.TIMESTAMP_HOP_SIZE,
                cfg.sample_rate)
            float(jnp.sum(flat[:, 0]))          # fetch barrier
            return flat, N

        def fn(flat, N):
            emb = _timestamp_pipeline(model, flat, N, encode_fn=encode_fn)
            return float(jnp.sum(emb.astype(jnp.float32)))

        fn(*stage(clips(0)))  # compile + warm
        best = float("inf")
        for r in range(args.reps):
            staged = stage(clips(r + 1))
            t0 = time.time()
            fn(*staged)
            best = min(best, time.time() - t0)
        results = {"timestamp_device": {
            "clips_per_sec": round(args.n_clips / best, 1),
            "ms_total": round(best * 1e3, 1)}}

        if args.module == "conv":
            # scene pipeline from device-resident audio (same mel -> scene
            # stats -> batched forward as get_scene_embeddings' equal-length
            # path, minus the host upload the e2e row includes)
            import jax

            def scene(aud):
                lms = model.to_feature(aud)
                mean = lms.mean(axis=(1, 2, 3)).mean()
                std = lms.std(axis=(1, 2, 3), ddof=1).mean()
                emb = model.forward((lms - mean) / std)
                return jnp.sum(emb.astype(jnp.float32))

            scene_j = jax.jit(scene)

            def stage_audio(a):
                aud = jnp.asarray(np.asarray(a))
                float(jnp.sum(aud[:, 0]))            # fetch barrier
                return aud

            r0 = float(scene_j(stage_audio(clips(0))))
            best = float("inf")
            for r in range(args.reps):
                aud = stage_audio(clips(r + 1))
                t0 = time.time()
                v = float(scene_j(aud))
                best = min(best, time.time() - t0)
                assert v != r0
            results["scene_device"] = {
                "clips_per_sec": round(args.n_clips / best, 1),
                "ms_total": round(best * 1e3, 1)}

        print(json.dumps({
            "module": args.module, "model": args.model,
            "fast_mel": args.fast_mel, "fused_conv": args.fused_conv,
            "n_clips": args.n_clips, "device_only": True,
            "results": results,
        }))
        return

    results = {}
    for name, fn in [
        ("scene", lambda a: mod.get_scene_embeddings(a, model)),
        ("timestamp", lambda a: mod.get_timestamp_embeddings(a, model)),
    ]:
        out = fn(clips(0))  # compile + warm
        emb = out[0] if isinstance(out, tuple) else out
        best = float("inf")
        for r in range(args.reps):
            a = clips(r + 1)
            t0 = time.time()
            fn(a)
            best = min(best, time.time() - t0)
        row = {
            "clips_per_sec": round(args.n_clips / best, 1),
            "ms_total": round(best * 1e3, 1),
            "emb_shape": list(emb.shape),
        }
        if name == "timestamp":
            row["frames_per_sec"] = round(
                args.n_clips * emb.shape[1] / best, 0)
        results[name] = row
        print(name, json.dumps(row))

    print(json.dumps({
        "module": args.module, "model": args.model,
        "fast_mel": args.fast_mel, "fetch_dtype": args.fetch_dtype,
        "n_clips": args.n_clips,
        "results": results,
    }))


if __name__ == "__main__":
    main()
