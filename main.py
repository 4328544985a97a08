"""Barlow Twins pretraining entry point (reference main.py).

Same CLI flag surface; TPU-native internals: one jit-compiled train step over
a data mesh does augmentation, both forwards, the psum'd BT loss, and the
optimizer update on device.

Example:
    python main.py --dataset synthetic --model_type audiontt --epochs 1 \
        --batch_size 8 --synthetic_steps_per_epoch 4 --no_eval
"""
from __future__ import annotations

import datetime
import os

from ssl_audio_tpu.config import config_from_args
from ssl_audio_tpu.train.loop import Trainer
from ssl_audio_tpu.utils.logging_utils import WandbRun


def main(argv=None):
    cfg = config_from_args(argv)

    from ssl_audio_tpu.parallel import init_distributed

    init_distributed(cfg)

    timestamp = datetime.datetime.now().strftime("%H:%M_%h%d")
    save_name = (
        f"{cfg.model_type}_{cfg.epochs}_epochs" if cfg.name == ""
        else f"{cfg.model_type}_{cfg.name}"
    ) + timestamp

    import jax

    if jax.process_index() == 0:
        wandb_run = WandbRun(project=f"Pre-training {cfg.dataset}", config=cfg,
                             name=save_name)
        log_dir = f"logs/training/{cfg.dataset}/{save_name}/"
    else:
        wandb_run, log_dir = None, None

    ckpt_path = os.path.join(cfg.save_base_dir, f"results/{cfg.dataset}/{save_name}")
    os.makedirs(ckpt_path, exist_ok=True)

    eval_fn = None
    if not cfg.no_eval and cfg.dataset == "cifar10":
        # cifar10 sanity path: weighted-cosine kNN monitor per epoch
        # (reference main.py:479-483)
        try:
            from ssl_audio_tpu.eval.cifar_knn import make_cifar_knn_eval_fn

            eval_fn = make_cifar_knn_eval_fn(cfg, wandb_run=wandb_run)
        except FileNotFoundError as e:
            print(f"kNN eval disabled: {e}")
    elif not cfg.no_eval and cfg.dataset not in ("synthetic",):
        try:
            from ssl_audio_tpu.eval.linear import make_epoch_eval_fn

            eval_fn = make_epoch_eval_fn(cfg, wandb_run=wandb_run)
        except (ImportError, FileNotFoundError) as e:
            print(f"Epoch eval disabled: {e}")

    trainer = Trainer(cfg, byol=False, log_dir=log_dir, wandb_run=wandb_run)
    trainer.fit(ckpt_path=ckpt_path, resume_path=cfg.resume_path, eval_fn=eval_fn)
    if wandb_run is not None:
        wandb_run.finish()


if __name__ == "__main__":
    main()
