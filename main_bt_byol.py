"""BYOL-style Barlow Twins pretraining (reference main_bt_byol.py): separate
online and target encoder stacks; with --stop_gradient the target is frozen
and EMA-updated (--moving_average_decay) before each optimizer step.

Example:
    python main_bt_byol.py --dataset synthetic --model_type audiontt \
        --epochs 1 --batch_size 8 --stop_gradient --predictor --no_eval
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
        f"{cfg.model_type}_byol_{cfg.epochs}_epochs" if cfg.name == ""
        else f"{cfg.model_type}_byol_{cfg.name}"
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
    if not cfg.no_eval and cfg.dataset not in ("synthetic",):
        try:
            from ssl_audio_tpu.eval.linear import make_epoch_eval_fn

            eval_fn = make_epoch_eval_fn(cfg, wandb_run=wandb_run)
        except (ImportError, FileNotFoundError) as e:
            print(f"Epoch eval disabled: {e}")

    trainer = Trainer(cfg, byol=True, log_dir=log_dir, wandb_run=wandb_run)
    trainer.fit(ckpt_path=ckpt_path, resume_path=cfg.resume_path, eval_fn=eval_fn)
    if wandb_run is not None:
        wandb_run.finish()


if __name__ == "__main__":
    main()
