"""Legacy-generation pretraining dispatch (reference old/main_pretrain.py:
--method barlow|dino|byola selects the SSL objective family).

barlow -> the standard Trainer (same as main.py)
dino   -> EMA teacher + DINO centered/sharpened CE (old/methods/dino.py)
byola  -> BYOL-A symmetric normalized-MSE with EMA target (old/byola/)

Example:
    python main_pretrain.py --method dino --dataset synthetic \
        --model_type audiontt --epochs 1 --batch_size 8 \
        --synthetic_steps_per_epoch 4 --no_eval
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

from ssl_audio_tpu.config import Config, build_argparser, setup_model_defaults


def run_legacy(cfg, method: str, argv_extra):
    import jax

    from ssl_audio_tpu.objectives.dino import teacher_temp_schedule
    from ssl_audio_tpu.parallel import get_mesh, shard_batch
    from ssl_audio_tpu.train.legacy_steps import (
        init_legacy_state,
        make_byola_train_step,
        make_dino_train_step,
    )
    from ssl_audio_tpu.train.loop import get_train_dataset
    from ssl_audio_tpu.data.pipeline import DataLoader
    from ssl_audio_tpu.utils import checkpoint as ckpt_lib

    dataset = get_train_dataset(cfg)
    loader = DataLoader(dataset, cfg.batch_size, num_workers=cfg.num_workers,
                        seed=cfg.seed)
    mesh = get_mesh(cfg.data_axis_size)
    mods, state = init_legacy_state(cfg, jax.random.key(cfg.seed), method,
                                    niter_per_ep=len(loader))

    if method == "dino":
        from ssl_audio_tpu.utils.schedules import cosine_scheduler

        step = make_dino_train_step(mods)
        # per-EPOCH teacher temp (DINOLoss, old/methods/dino.py:340-346) and
        # per-ITERATION teacher momentum cosine -> 1 (dino.py:148-155,
        # indexed at the global iteration, dino.py:210-214)
        temp_sched = teacher_temp_schedule(
            cfg.warmup_teacher_temp, cfg.teacher_temp,
            min(cfg.warmup_teacher_temp_epochs, cfg.epochs), cfg.epochs)
        mom = cosine_scheduler(cfg.momentum_teacher, 1.0, cfg.epochs,
                               len(loader))
    else:
        step = make_byola_train_step(mods)

    key = jax.random.key(cfg.seed + 1)
    for epoch in range(1, cfg.epochs + 1):
        loader.set_epoch(epoch)
        last = None
        for i, (lms, _y) in enumerate(loader):
            key, k = jax.random.split(key)
            batch = shard_batch(lms, mesh)
            if method == "dino":
                it = (epoch - 1) * len(loader) + i
                state, m = step(state, batch, k,
                                np.float32(temp_sched[epoch - 1]),
                                np.float32(mom[it]))
            else:
                state, m = step(state, batch, k, np.float32(0.0))
            last = m
        loss = float(last["loss"]) if last else float("nan")
        print(f"[{method}] epoch {epoch}/{cfg.epochs} loss={loss:.4f}")
        assert np.isfinite(loss), "non-finite loss"

    ckpt_path = os.path.join(cfg.save_base_dir,
                             f"results/{cfg.dataset}/{method}_{cfg.model_type}")
    os.makedirs(ckpt_path, exist_ok=True)
    ckpt_lib.save_checkpoint(os.path.join(ckpt_path, f"model_{cfg.epochs}"),
                             jax.device_get(state), cfg.epochs + 1)
    print(f"Saved {ckpt_path}/model_{cfg.epochs}")
    return state


def main(argv=None):
    parser = build_argparser()
    parser.add_argument("--method", type=str, default="barlow",
                        choices=["barlow", "dino", "byola"])
    args = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = setup_model_defaults(
        Config(**{k: v for k, v in vars(args).items() if k in known}),
        method=None if args.method == "barlow" else args.method,
    )

    if args.method == "barlow":
        from ssl_audio_tpu.train.loop import Trainer

        trainer = Trainer(cfg)
        ckpt = os.path.join(cfg.save_base_dir,
                            f"results/{cfg.dataset}/barlow_{cfg.model_type}")
        os.makedirs(ckpt, exist_ok=True)
        return trainer.fit(ckpt_path=ckpt)
    return run_legacy(cfg, args.method, argv)


if __name__ == "__main__":
    main()
