"""Dataset normalization statistics tool (reference datasets.py:362-376 /
old/data_manager/norm_stats.py): mean/std over randomly sampled items,
written to norm_stats.json.

Usage:
    python tools/norm_stats.py --dataset fsd50k --n_norm_calc 10000
"""
from __future__ import annotations

import json

from ssl_audio_tpu.config import config_from_args


def main(argv=None):
    import sys

    n_norm_calc = 10000
    argv = list(argv) if argv is not None else sys.argv[1:]
    if "--n_norm_calc" in argv:
        i = argv.index("--n_norm_calc")
        n_norm_calc = int(argv[i + 1])
        del argv[i : i + 2]
    cfg = config_from_args(argv)

    from ssl_audio_tpu.data.datasets import calculate_norm_stats
    from ssl_audio_tpu.train.loop import get_train_dataset

    ds = get_train_dataset(cfg.replace(pre_norm=True))  # unnormalized samples
    ds.norm_stats = None
    mean, std = calculate_norm_stats(ds, n_norm_calc=n_norm_calc, seed=cfg.seed)
    print(f"Dataset contains {len(ds)} files with normalizing stats\n"
          f"mean: {mean}\t std: {std}")
    with open("norm_stats.json", "w") as f:
        json.dump({"mean": mean, "std": std}, f, indent=2)
    return mean, std


if __name__ == "__main__":
    main()
