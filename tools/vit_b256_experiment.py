"""ViT-B B=256 anti-scaling experiment (VERDICT r2 #5; PERF.md "Known
inefficiencies"): is the ~11% per-sample throughput loss at B=256 caused by
the per-sample RandomResizeCrop interpolation matrices?

Times the full ViT-B token-drop train step at B in {128, 256} under three
augmentation variants:
  per-sample — production behavior (a (H_out, canvas) matrix pair per clip)
  shared     — ONE interpolation matrix pair for the whole batch
               (diagnostic only: changes semantics)
  no-rrc     — RandomResizeCrop disabled entirely

If shared/no-rrc close the B=256 gap, the matrices are the regression; if
the ~11% persists, it confirms the trace's verdict (XLA VMEM-tiling
thresholds in the (6400, 3072) LayerNorm/GELU fusions), closing the
question either way.

    python tools/vit_b256_experiment.py --batches 128 256
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def patched_rrc(mode: str):
    import jax
    import jax.numpy as jnp

    from ssl_audio_tpu.augment import augmentations as A

    orig = A.random_resize_crop

    if mode == "per-sample":
        return orig

    @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
    def shared(key, lms, out_size=(64, 96), virtual_crop_scale=(1.0, 1.5),
               freq_scale=(0.6, 1.5), time_scale=(0.6, 1.5)):
        if mode == "no-rrc":
            return lms
        # one matrix pair for the whole batch: treat the batch as channels
        B, C, F, T = lms.shape
        out = A._rrc_single(
            key, lms.reshape(B * C, F, T), out_size=out_size,
            virtual_crop_scale=virtual_crop_scale,
            freq_scale=freq_scale, time_scale=time_scale)
        return out.reshape(B, C, out_size[0], out_size[1])

    return shared


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="+", type=int, default=[128, 256])
    p.add_argument("--modes", nargs="+",
                   default=["per-sample", "shared", "no-rrc"])
    p.add_argument("--out", default="vit_b256_experiment.json")
    args = p.parse_args(argv)

    from ssl_audio_tpu.augment import augmentations as A
    from tools import mfu

    rows = []
    for mode in args.modes:
        A.random_resize_crop = patched_rrc(mode)
        for b in args.batches:
            r = mfu.measure("vit_base", b, token_drop=True)
            r["rrc_mode"] = mode
            print(json.dumps(r))
            rows.append(r)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
