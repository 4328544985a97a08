"""Folded-vs-unfolded Pallas mel kernel A/B (r4 follow-up to the XLA-side
Hann fold, PERF.md "Folded-DFT GEMM").

Methodology (r5, per ADVICE r4):
  * SLOPE timing — every measurement times TWO scan lengths (n and 2n)
    back-to-back and reports (t_2n - t_n)/n, which cancels the fixed
    per-call dispatch+fetch tunnel overhead (~25-45 ms/call, CLAUDE.md)
    that a single-length total/n would fold into ms_per_step.
  * Reps are INTERLEAVED across variants (round-robin) because tunnel/chip
    throughput drifts on minute scales (CLAUDE.md 2026-08-19) —
    sequential-phase comparisons are untrustworthy on noisy days.
  * Only the post-compile full-set rounds count toward the published
    numbers (median over equal rep counts); the incremental
    rounds run after each compile are warmup, so earlier-compiled
    variants no longer accumulate extra best-of reps.
Results are dumped incrementally after every round so a timeout preserves
progress.

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

    def make_scanned(fn, n_steps):
        def scanned(wavs, seed):
            def body(acc, i):
                out = fn(wavs + (seed + i).astype(jnp.float32) * 1e-4)
                return acc + out.mean(), None

            acc, _ = lax.scan(body, seed.astype(jnp.float32) * 1e-3,
                              jnp.arange(n_steps))
            return acc

        return jax.jit(scanned)

    n = args.n_steps
    fns = {}
    for name, fn in variants:
        pair = (make_scanned(fn, n), make_scanned(fn, 2 * n))
        t0 = time.time()
        a = float(pair[0](wavs, jnp.int32(0)))     # compile + warm (n)
        a2 = float(pair[1](wavs, jnp.int32(1)))    # compile + warm (2n)
        print(f"compiled {name} in {time.time() - t0:.0f}s "
              f"(checksums {a:.4f}/{a2:.4f})", flush=True)
        fns[name] = pair
        # one untimed round over everything compiled so far keeps the chip
        # warm, but contributes NOTHING to the published stats (equal-count
        # rule, ADVICE r4)
        for g, g2 in fns.values():
            float(g(wavs, jnp.int32(7)))
            float(g2(wavs, jnp.int32(8)))

    # equal-count interleaved slope rounds — the only timing that publishes
    slopes: dict = {name: [] for name in fns}
    calls: dict = {name: [] for name in fns}
    for rep in range(args.reps):
        for name, (g, g2) in fns.items():
            t0 = time.time()
            b = float(g(wavs, jnp.int32(200 + rep)))
            t1 = time.time()
            b2 = float(g2(wavs, jnp.int32(300 + rep)))
            t2 = time.time()
            assert b2 != b
            slopes[name].append(((t2 - t1) - (t1 - t0)) / n * 1e3)
            calls[name].append((t1 - t0) * 1e3)
        out = {}
        for name in fns:
            s = float(np.median(slopes[name]))
            # fixed per-call overhead implied by the n-length call
            ovh = float(np.median(calls[name])) - s * n
            out[name] = {"ms_per_step": round(s, 2),
                         "clips_per_sec": round(B / (s / 1e3), 1),
                         "dispatch_overhead_ms": round(ovh, 1),
                         "reps": len(slopes[name])}
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
        print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
