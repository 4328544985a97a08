"""Benchmark: fused mel+augmentation frontend throughput on one chip.

Measures the BASELINE.json north-star metric — 10-second AudioSet-style clips
per second per chip through wav -> log-mel -> random 96-frame crop -> two
augmented global views, all as one jit-compiled device function.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 8000 (the >=8k clips/sec/chip target).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ssl_audio_tpu.augment.transforms import init_augment_state, make_pair_views
    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram

    cfg = default_config(model_type="audiontt", batch_size=256)
    spec = MelSpec.from_config(cfg)

    B = 256                       # clips per step
    clip_samples = 160_000        # 10 s at 16 kHz
    n_frames = spec.num_frames(clip_samples)  # 1001

    aug_state = init_augment_state(cfg)

    def frontend(key, wavs, aug_state):
        """wav batch -> two augmented training views (the reference's whole
        CPU-side per-sample pipeline: datasets.py mel+crop+normalize, then
        AudioPairTransform)."""
        k_crop, k_aug = jax.random.split(key)
        lms = log_mel_spectrogram(wavs, spec)            # (B, 64, 1001)
        # random 96-frame crop per clip (datasets.py:87-90)
        starts = jax.random.randint(k_crop, (B,), 0, n_frames - cfg.crop_frames)
        idx = starts[:, None] + jnp.arange(cfg.crop_frames)[None, :]
        lms = jnp.take_along_axis(lms, idx[:, None, :], axis=2)[:, None]  # (B,1,64,96)
        lms = (lms - (-0.8294)) / 4.6230                 # audioset stats (main.py:293)
        views, aug_state = make_pair_views(k_aug, lms, aug_state, cfg)
        return views, aug_state

    fe = jax.jit(frontend, donate_argnums=(2,))

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal((B, clip_samples)).astype(np.float32) * 0.1)

    # warmup / compile
    t0 = time.time()
    views, aug_state = fe(jax.random.key(0), wavs, aug_state)
    jax.block_until_ready(views)
    compile_time = time.time() - t0
    print(f"# compile: {compile_time:.1f}s, backend={jax.default_backend()}",
          file=sys.stderr)

    # timed steps (same wav buffer: measuring device frontend, not host RNG)
    n_iter = 20
    t0 = time.time()
    for i in range(n_iter):
        views, aug_state = fe(jax.random.fold_in(jax.random.key(1), i), wavs, aug_state)
    jax.block_until_ready(views)
    dt = time.time() - t0
    clips_per_sec = B * n_iter / dt

    print(json.dumps({
        "metric": "frontend_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 1),
        "unit": "10s_clips/sec/chip",
        "vs_baseline": round(clips_per_sec / 8000.0, 3),
    }))


if __name__ == "__main__":
    main()
