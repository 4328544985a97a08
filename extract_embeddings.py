"""Batch embedding extraction CLI: dataset -> embeddings + labels `.npy`.

A production-serving convenience on top of the eval stack (the reference's
equivalent flow lives inline in linear.py/get_embeddings): load a checkpoint,
run the encoder over a dataset split, save X/y arrays for downstream probes.

Example:
    python extract_embeddings.py --dataset fsd50k --split test \
        --model_type audiontt --model_file_path results/.../model_100 \
        --out_prefix emb/fsd50k_test
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

from ssl_audio_tpu.config import Config, build_argparser, setup_model_defaults


def main(argv=None):
    parser = build_argparser()
    parser.add_argument("--model_file_path", type=str, default="")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "train_val", "val", "test"])
    parser.add_argument("--out_prefix", type=str, required=True)
    parser.add_argument("--eval_crop_frames", type=int, default=711)
    args = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = setup_model_defaults(Config(**{k: v for k, v in vars(args).items() if k in known}))

    import jax

    from ssl_audio_tpu.data import datasets as D
    from ssl_audio_tpu.data.pipeline import DataLoader
    from ssl_audio_tpu.eval.encode import extract_embeddings
    from ssl_audio_tpu.eval.linear import make_embedding_forward
    from ssl_audio_tpu.train.state import init_train_state
    from ssl_audio_tpu.utils import checkpoint as ckpt_lib

    if cfg.dataset == "fsd50k":
        ds = D.FSD50K(cfg, split=args.split, norm_stats=D.NORM_STATS["fsd50k"],
                      crop_frames=args.eval_crop_frames)
    elif cfg.dataset == "audioset":
        ds = D.AudioSet(cfg, norm_stats=D.NORM_STATS["audioset"])
    elif cfg.dataset == "synthetic":
        ds = D.SyntheticLMS(cfg, length=cfg.synthetic_steps_per_epoch * cfg.batch_size)
    else:
        raise ValueError(f"unsupported dataset {cfg.dataset}")

    loader = DataLoader(ds, cfg.batch_size, shuffle=False, drop_last=False,
                        num_workers=cfg.num_workers)
    mods, state = init_train_state(cfg, jax.random.key(cfg.seed))
    if args.model_file_path:
        # encoder-graft load: also accepts legacy DINO/BYOL-A checkpoints
        state = ckpt_lib.load_encoder_checkpoint(
            args.model_file_path, jax.device_get(state))
    forward = make_embedding_forward(
        cfg, mods, jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    X, y = extract_embeddings(forward, loader)
    os.makedirs(os.path.dirname(args.out_prefix) or ".", exist_ok=True)
    np.save(args.out_prefix + "_X.npy", X)
    np.save(args.out_prefix + "_y.npy", y)
    print(f"saved {X.shape} embeddings -> {args.out_prefix}_X.npy / _y.npy")
    return X, y


if __name__ == "__main__":
    main()
