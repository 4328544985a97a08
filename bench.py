"""Benchmark: fused mel+augmentation frontend throughput on one chip.

Measures the BASELINE.json north-star metric — 10-second AudioSet-style clips
per second per chip through wav -> log-mel -> random 96-frame crop ->
normalize -> two augmented global views, all inside one jit.

Methodology: N pipeline steps run inside ONE lax.scan (serialized on device,
augmentation state threaded through), and a scalar checksum of every step's
views is fetched to host — so the timing counts fully-materialized results,
not async dispatch.  Because the crop happens in the same jit, XLA hoists the
frame gather above the windowed-DFT GEMMs and transforms only the ~96 frames
each view needs (the reference's torchaudio path always transforms all 1001).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 8000 (the >=8k clips/sec/chip target).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ssl_audio_tpu.augment.transforms import init_augment_state, make_pair_views
    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram

    cfg = default_config(model_type="audiontt", batch_size=256)
    spec = MelSpec.from_config(cfg)

    B = 256                       # clips per step
    N = 20                        # pipeline steps per scan
    clip_samples = 160_000        # 10 s at 16 kHz
    n_frames = spec.num_frames(clip_samples)  # 1001

    def body(key, wavs, aug_state):
        """The reference's whole CPU-side per-sample pipeline
        (datasets.py mel+crop+normalize, then AudioPairTransform), batched."""
        k_crop, k_aug = jax.random.split(key)
        lms = log_mel_spectrogram(wavs, spec)            # (B, 64, 1001)
        starts = jax.random.randint(k_crop, (B,), 0, n_frames - cfg.crop_frames + 1)
        idx = starts[:, None] + jnp.arange(cfg.crop_frames)[None, :]
        lms = jnp.take_along_axis(lms, idx[:, None, :], axis=2)[:, None]
        lms = (lms - (-0.8294)) / 4.6230                 # audioset stats (main.py:293)
        views, aug_state = make_pair_views(k_aug, lms, aug_state, cfg)
        return views[0].mean() + views[1].mean(), aug_state

    def scanned(key, wavs, aug_state):
        def step(carry, i):
            st, acc = carry
            out, st = body(jax.random.fold_in(key, i), wavs, st)
            return (st, acc + out), None
        (aug_state, acc), _ = lax.scan(
            step, (aug_state, jnp.float32(0.0)), jnp.arange(N)
        )
        return acc

    f = jax.jit(scanned)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal((B, clip_samples)).astype(np.float32) * 0.1)
    aug_state = init_augment_state(cfg)

    t0 = time.time()
    a = float(f(jax.random.key(0), wavs, aug_state))   # compile + run
    compile_time = time.time() - t0
    print(f"# warmup(incl. compile): {compile_time:.1f}s, backend={jax.default_backend()}",
          file=sys.stderr)

    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        b = float(f(jax.random.key(rep + 1), wavs, aug_state))  # fetch barrier
        dt = (time.time() - t0) / N
        best = min(best, dt)
        assert b != a
    clips_per_sec = B / best

    print(json.dumps({
        "metric": "frontend_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 1),
        "unit": "10s_clips/sec/chip",
        "vs_baseline": round(clips_per_sec / 8000.0, 3),
    }))


if __name__ == "__main__":
    main()
