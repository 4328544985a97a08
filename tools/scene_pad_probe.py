"""Scene-path odd-width tiling probe (VERDICT r4 #8, stretch).

The HEAR conv scene trace shows the (64, 1001) conv ops running at
200-450 GB/s — sub-roofline tiling on the odd time dim (PERF.md).  This
probe times the audiontt eval forward on device-resident batches at
T = 1001 (production), 1008 (next multiple of 8, zero-padded) and 1024
(power of two), interleaved same-process, to decide whether a
pad-time-then-crop serving option is worth >10% on the 4.0k clips/s scene
rate.  Also reports the embedding delta of zero-pad-then-forward vs the
unpadded forward (the pooled frame count is identical at these pads:
ceil(1001/8) == ceil(1008/8) == 126).

    python tools/scene_pad_probe.py --batch 64 --reps 4
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--out", default="scene_pad_probe.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.models.wrapper import build_encoder

    cfg = default_config(model_type="audiontt")
    enc, embed_dim = build_encoder(cfg)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((args.batch, 1, 64, 1001)).astype(np.float32)
    variables = enc.init({"params": jax.random.key(0)},
                         jnp.asarray(x0[:2]), train=False)

    def fwd(v, x):
        return enc.apply(v, x, train=False)

    def make(T, k):
        @jax.jit
        def run(v, x, key):
            def body(c, i):
                xx = x + jax.random.uniform(key, (1,), x.dtype) * (i + 1) * 1e-6
                out = fwd(v, xx)
                return c + out.mean(), 0.0

            total, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return total

        return run

    batches = {
        1001: jnp.asarray(x0),
        1008: jnp.pad(jnp.asarray(x0), ((0, 0), (0, 0), (0, 0), (0, 7))),
        1024: jnp.pad(jnp.asarray(x0), ((0, 0), (0, 0), (0, 0), (0, 23))),
    }
    fns = {}
    for T, xb in batches.items():
        pair = (make(T, args.n), make(T, 2 * args.n))
        t0 = time.time()
        float(pair[0](variables, xb, jax.random.key(0)))
        float(pair[1](variables, xb, jax.random.key(0)))
        print(f"compiled T={T} in {time.time() - t0:.0f}s", flush=True)
        fns[T] = pair

    best = {T: [float("inf")] * 2 for T in fns}
    for rep in range(args.reps):
        for T, (f1, f2) in fns.items():
            xb = batches[T]
            t0 = time.time()
            float(f1(variables, xb, jax.random.key(rep + 1)))
            t1 = time.time()
            float(f2(variables, xb, jax.random.key(rep + 1)))
            t2 = time.time()
            best[T][0] = min(best[T][0], t1 - t0)
            best[T][1] = min(best[T][1], t2 - t1)

    results = {}
    for T, (b1, b2) in best.items():
        ms = (b2 - b1) / args.n * 1e3
        results[str(T)] = {"ms_per_fwd": round(ms, 3),
                           "clips_per_sec": round(args.batch / (ms / 1e3), 1)}
        print(f"T={T}: {ms:.3f} ms  {args.batch / (ms / 1e3):.0f} clips/s")

    # embedding semantics: zero-pad to 1008 vs unpadded (identical pooled
    # frame count; the pad only perturbs the edge receptive fields)
    e0 = np.asarray(fwd(variables, batches[1001][:8]))
    e1 = np.asarray(fwd(variables, batches[1008][:8]))
    rel = float(np.abs(e1 - e0).max() / (np.abs(e0).max() + 1e-12))
    results["pad1008_embed_rel_delta"] = round(rel, 6)
    print(f"pad-to-1008 embedding rel delta: {rel:.2e}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
