"""Folded-vs-unfolded Pallas mel kernel A/B (r4 follow-up to the XLA-side
Hann fold, PERF.md "Folded-DFT GEMM").

Same scan+checksum methodology as tools/bench_mel.py, but reps are
INTERLEAVED across variants (round-robin, min per variant) because the
tunnel/chip throughput drifts on minute scales (CLAUDE.md 2026-08-19) —
sequential-phase comparisons are untrustworthy on noisy days.  Results are
dumped incrementally after every round so a timeout preserves progress.

    python tools/bench_mel_fold.py --batch 256 --seconds 10
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
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--n_steps", type=int, default=10)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--out", type=str, default="mel_bench_fold.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram
    from ssl_audio_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

    spec = MelSpec()
    B = args.batch
    L = int(args.seconds * spec.sample_rate)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(0.1 * rng.standard_normal((B, L)).astype(np.float32))
    print(f"backend={jax.default_backend()} B={B} L={L} "
          f"frames={spec.num_frames(L)}", flush=True)

    # compile order = priority order: anchors first so a timeout still
    # leaves an interpretable pair
    variants = [
        ("xla_high", lambda w: log_mel_spectrogram(w, spec, True)),
        ("pallas_high_folded",
         lambda w: log_mel_spectrogram_pallas(w, spec, True)),
        ("pallas_high_unfolded",
         lambda w: log_mel_spectrogram_pallas(w, spec, True, fold=False)),
        ("xla_highest", lambda w: log_mel_spectrogram(w, spec)),
        ("pallas_highest_folded",
         lambda w: log_mel_spectrogram_pallas(w, spec)),
    ]

    def make_scanned(fn):
        def scanned(wavs, seed):
            def body(acc, i):
                out = fn(wavs + (seed + i).astype(jnp.float32) * 1e-4)
                return acc + out.mean(), None

            acc, _ = lax.scan(body, seed.astype(jnp.float32) * 1e-3,
                              jnp.arange(args.n_steps))
            return acc

        return jax.jit(scanned)

    rows: dict = {}
    fns = {}
    for name, fn in variants:
        f = make_scanned(fn)
        t0 = time.time()
        a = float(f(wavs, jnp.int32(0)))          # compile + warm
        print(f"compiled {name} in {time.time() - t0:.0f}s "
              f"(checksum {a:.4f})", flush=True)
        fns[name] = (f, a)
        rows[name] = {"best_ms": float("inf")}

        # interleave: after each new compile, one timing round over every
        # variant compiled so far keeps pairs comparable even on timeout
        for rep in range(2):
            for n, (g, warm) in fns.items():
                t0 = time.time()
                b = float(g(wavs, jnp.int32(100 + rep)))
                dt = (time.time() - t0) / args.n_steps
                assert b != warm
                rows[n]["best_ms"] = min(rows[n]["best_ms"], dt * 1e3)
        out = {n: {"ms_per_step": round(r["best_ms"], 2),
                   "clips_per_sec": round(B / (r["best_ms"] / 1e3), 1)}
               for n, r in rows.items()}
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
        print(json.dumps(out), flush=True)

    # final interleaved rounds with the full set
    for rep in range(args.reps):
        for n, (g, warm) in fns.items():
            t0 = time.time()
            b = float(g(wavs, jnp.int32(200 + rep)))
            dt = (time.time() - t0) / args.n_steps
            assert b != warm
            rows[n]["best_ms"] = min(rows[n]["best_ms"], dt * 1e3)
    out = {n: {"ms_per_step": round(r["best_ms"], 2),
               "clips_per_sec": round(B / (r["best_ms"] / 1e3), 1)}
           for n, r in rows.items()}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
