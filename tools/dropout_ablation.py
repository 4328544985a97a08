"""Quantify the dropout mask-generation (threefry) cost inside the AudioNTT
train step: times the step with nn.Dropout monkeypatched to identity vs
production.  If the delta is large, the fix is a cheaper PRNG for the
dropout stream (rbg), not a smaller model.

    python tools/dropout_ablation.py --batch 256
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--out", default="dropout_ablation.json")
    args = p.parse_args(argv)

    import flax.linen as nn

    from tools import mfu

    rows = []
    r = mfu.measure("audiontt", args.batch, use_fp16=True, wav=True,
                    fused_conv=True, fast_mel=True)
    r["dropout"] = "threefry"
    print(json.dumps(r))
    rows.append(r)

    orig = nn.Dropout.__call__
    nn.Dropout.__call__ = lambda self, x, deterministic=None, rng=None: x
    try:
        r = mfu.measure("audiontt", args.batch, use_fp16=True, wav=True,
                        fused_conv=True, fast_mel=True)
    finally:
        nn.Dropout.__call__ = orig
    r["dropout"] = "disabled"
    print(json.dumps(r))
    rows.append(r)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
