"""Supervised evaluation entry: linear probe or full finetune of a pretrained
encoder on a labeled dataset (reference old/evaluate/linear.py and
finetune.py, AudioSet-20k protocol).

Example:
    python evaluate.py --mode finetune --dataset fsd50k --model_type audiontt \
        --model_file_path results/fsd50k/<run>/model_100 --eval_epochs 10
"""
from __future__ import annotations

import dataclasses

from ssl_audio_tpu.config import Config, build_argparser, setup_model_defaults


def main(argv=None):
    parser = build_argparser()
    parser.add_argument("--mode", type=str, default="linear",
                        choices=["linear", "finetune"])
    parser.add_argument("--model_file_path", type=str, default="")
    parser.add_argument("--eval_epochs", type=int, default=10)
    parser.add_argument("--eval_lr", type=float, default=1e-3)
    parser.add_argument("--specaug", action="store_true", default=False)
    parser.add_argument("--eval_mixup", type=float, default=0.0)
    args = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = setup_model_defaults(Config(**{k: v for k, v in vars(args).items() if k in known}))

    import jax

    from ssl_audio_tpu.data import datasets as D
    from ssl_audio_tpu.data.pipeline import DataLoader
    from ssl_audio_tpu.eval.finetune import train_classifier
    from ssl_audio_tpu.train.state import init_train_state
    from ssl_audio_tpu.utils import checkpoint as ckpt_lib

    if cfg.dataset == "fsd50k":
        train_ds = D.FSD50K(cfg, split="train", norm_stats=D.NORM_STATS["fsd50k"])
        val_ds = D.FSD50K(cfg, split="val", norm_stats=D.NORM_STATS["fsd50k"])
        single_label = False
    elif cfg.dataset == "audioset":
        # AudioSet-20k protocol: probe trains on (balanced) train segments and
        # is scored on the EVAL segments (old/evaluate/linear.py test loaders,
        # eval CSV selection old/data_manager/audioset_lms.py:72-78) — never
        # on the training set itself.
        train_ds = D.AudioSet(cfg, norm_stats=D.NORM_STATS["audioset"])
        val_ds = D.AudioSet(cfg, norm_stats=D.NORM_STATS["audioset"], test=True)
        single_label = False
    elif cfg.dataset == "synthetic":
        train_ds = D.SyntheticLMS(cfg, length=cfg.synthetic_steps_per_epoch * cfg.batch_size)
        val_ds = D.SyntheticLMS(cfg, length=4 * cfg.batch_size, seed=cfg.seed + 1)
        single_label = False
    else:
        raise ValueError(f"unsupported eval dataset {cfg.dataset}")

    train_loader = DataLoader(train_ds, cfg.batch_size, num_workers=cfg.num_workers)
    val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=False, drop_last=False,
                            num_workers=cfg.num_workers)

    mods, state = init_train_state(cfg, jax.random.key(cfg.seed))
    if args.model_file_path:
        # encoder-graft load: also accepts legacy DINO/BYOL-A checkpoints
        # whose head/optimizer trees differ (reference old/evaluate loads
        # only the backbone)
        state = ckpt_lib.load_encoder_checkpoint(
            args.model_file_path, jax.device_get(state))

    trained, score = train_classifier(
        mods,
        jax.device_get(state.params),
        jax.device_get(state.batch_stats),
        train_loader,
        val_loader,
        n_classes=train_ds.label_num,
        epochs=args.eval_epochs,
        lr=args.eval_lr,
        finetune=args.mode == "finetune",
        mixup_alpha=args.eval_mixup or None,
        specaug=args.specaug,
        single_label=single_label,
    )
    print(f"{args.mode} best val score: {score:.4f}")
    return score


if __name__ == "__main__":
    main()
