"""Linear probe evaluation entry point (reference linear.py).

Loads an Orbax checkpoint produced by main.py (no key-prefix surgery needed —
the state has stable names), extracts embeddings on FSD50K with 711-frame
crops, fits the MLP probe, and logs score + n=5 low-shot results.

Example:
    python linear.py --dataset fsd50k --model_type audiontt \
        --model_file_path results/fsd50k/<run>/model_100 --model_name myrun
"""
from __future__ import annotations

import os

import jax

from ssl_audio_tpu.config import build_argparser, setup_model_defaults, Config
from ssl_audio_tpu.eval.linear import eval_linear, get_fsd50k_eval_loaders, make_embedding_forward
from ssl_audio_tpu.train.state import init_train_state
from ssl_audio_tpu.utils import checkpoint as ckpt_lib
from ssl_audio_tpu.utils.logging_utils import make_csv_logger


def load_model(cfg, model_file_path: str):
    """Returns (mods, params, batch_stats) with weights from the checkpoint
    (or fresh init when model_file_path is empty, as the reference)."""
    mods, state = init_train_state(cfg, jax.random.key(cfg.seed))
    if model_file_path:
        # encoder-graft load: also accepts legacy DINO/BYOL-A checkpoints
        # (reference old/evaluate loads only the backbone)
        state = ckpt_lib.load_encoder_checkpoint(
            model_file_path, jax.device_get(state))
    return mods, state.params, state.batch_stats


def main(argv=None):
    parser = build_argparser()
    parser.add_argument("--model_file_path", type=str, default="")
    parser.add_argument("--model_name", type=str, default="")
    parser.add_argument("--model_epoch", type=int, default=100)
    args = parser.parse_args(argv)
    import dataclasses

    known = {f.name for f in dataclasses.fields(Config)}
    cfg = setup_model_defaults(Config(**{k: v for k, v in vars(args).items() if k in known}))

    log_dir = f"logs/linear_eval/{cfg.dataset}/{args.model_name}/"
    logger = make_csv_logger(log_dir)

    loaders = get_fsd50k_eval_loaders(cfg)
    mods, params, batch_stats = load_model(cfg, args.model_file_path)
    forward = make_embedding_forward(cfg, mods, params, batch_stats)

    scores = eval_linear(forward, *loaders)
    score_all = scores.get("score_all")
    score_5 = scores.get("score_5", (float("nan"), float("nan")))
    logger.info(
        "epoch,{},linear_score,{},linear_score_5_mean,{},linear_score_5_std,{}".format(
            args.model_epoch, score_all, score_5[0], score_5[1]
        )
    )
    print(f"linear_score={score_all} low_shot_5={score_5}")
    return scores


if __name__ == "__main__":
    main()
