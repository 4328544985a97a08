"""Mel-frontend shootout: XLA GEMM path vs the fused Pallas kernel, at both
precision modes (PERF.md 'mel only' rows; VERDICT r1 #7).

Methodology: N transforms of the same batch inside one lax.scan with a
varying additive fold-in (prevents memoization), scalar checksum fetched as
the barrier.

    python tools/bench_mel.py --batch 256 --seconds 10
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, wavs, n_steps=10, reps=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def scanned(wavs, seed):
        def body(acc, i):
            out = fn(wavs + (seed + i).astype(jnp.float32) * 1e-4)
            return acc + out.mean(), None

        # seed enters both the input (defeats the backend's bit-identical
        # execution memoization) and the checksum (sanity check below)
        acc, _ = lax.scan(body, seed.astype(jnp.float32) * 1e-3,
                          jnp.arange(n_steps))
        return acc

    f = jax.jit(scanned)
    a = float(f(wavs, jnp.int32(0)))
    best = float("inf")
    for rep in range(reps):
        t0 = time.time()
        b = float(f(wavs, jnp.int32(rep + 1)))
        best = min(best, (time.time() - t0) / n_steps)
        assert b != a
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--n_steps", type=int, default=10)
    p.add_argument("--out", type=str, default="mel_bench.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram
    from ssl_audio_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

    spec = MelSpec()
    B = args.batch
    L = int(args.seconds * spec.sample_rate)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(0.1 * rng.standard_normal((B, L)).astype(np.float32))
    print(f"backend={jax.default_backend()} B={B} L={L} "
          f"frames={spec.num_frames(L)}")

    # numerical parity on the real backend first
    ref = np.asarray(log_mel_spectrogram(wavs[:8], spec))
    for name, fn in [
        ("pallas", lambda w: log_mel_spectrogram_pallas(w, spec)),
        ("pallas_fast", lambda w: log_mel_spectrogram_pallas(w, spec, True)),
        ("pallas_precise",
         lambda w: log_mel_spectrogram_pallas(w, spec, mode="precise")),
        ("xla_fast", lambda w: log_mel_spectrogram(w, spec, True)),
    ]:
        got = np.asarray(fn(wavs[:8]))
        print(f"parity {name}: max|diff| = {np.abs(got - ref).max():.2e}")

    rows = {}
    for name, fn in [
        ("xla_highest", lambda w: log_mel_spectrogram(w, spec)),
        ("xla_high", lambda w: log_mel_spectrogram(w, spec, True)),
        ("pallas_highest", lambda w: log_mel_spectrogram_pallas(w, spec)),
        ("pallas_high", lambda w: log_mel_spectrogram_pallas(w, spec, True)),
        ("pallas_precise",
         lambda w: log_mel_spectrogram_pallas(w, spec, mode="precise")),
        ("pallas_highest_unfolded",
         lambda w: log_mel_spectrogram_pallas(w, spec, fold=False)),
        ("pallas_high_unfolded",
         lambda w: log_mel_spectrogram_pallas(w, spec, True, fold=False)),
    ]:
        dt = bench(fn, wavs, n_steps=args.n_steps)
        rows[name] = {"ms_per_step": round(dt * 1e3, 2),
                      "clips_per_sec": round(B / dt, 1)}
        print(name, rows[name])
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
