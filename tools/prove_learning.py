"""Learning proof: short pretrain with per-epoch probes rising from the
random-init baseline (the reference's validation story is exactly these
per-epoch probe hooks, main.py:479-519).

Runs anywhere (no data needed with --dataset synthetic); results go to
stdout as a table and to --out as JSON for PERF.md.

    python tools/prove_learning.py --dataset synthetic --model_type audiontt \
        --epochs 5 --batch_size 128 --synthetic_steps_per_epoch 100
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _LegacyTrainerShim:
    """Trainer-shaped wrapper over the legacy DINO/BYOL-A steps
    (train/legacy_steps.py; epoch loop mirrors main_pretrain.run_legacy) so
    probe_score sees the same .mods/.state surface — LegacyModules exposes
    .encoder and params/batch_stats['encoder'] exactly like Modules."""

    def __init__(self, cfg, method: str, dataset):
        import jax
        import numpy as np

        from ssl_audio_tpu.data.pipeline import DataLoader
        from ssl_audio_tpu.objectives.dino import teacher_temp_schedule
        from ssl_audio_tpu.parallel import get_mesh
        from ssl_audio_tpu.train.legacy_steps import (
            init_legacy_state,
            make_byola_train_step,
            make_dino_train_step,
        )

        self.cfg = cfg
        self.method = method
        self.loader = DataLoader(dataset, cfg.batch_size, shuffle=True,
                                 drop_last=True, num_workers=cfg.num_workers,
                                 seed=cfg.seed)
        self.mesh = get_mesh(cfg.data_axis_size)
        self.mods, self.state = init_legacy_state(
            cfg, jax.random.key(cfg.seed), method,
            niter_per_ep=len(self.loader))
        if method == "dino":
            from ssl_audio_tpu.utils.schedules import cosine_scheduler

            self.step = make_dino_train_step(self.mods)
            # the reference recipe: per-epoch teacher temp warmup
            # (dino.py:340-346) + per-iteration momentum cosine -> 1
            # (dino.py:148-155, 210-214)
            self.temp = teacher_temp_schedule(
                cfg.warmup_teacher_temp, cfg.teacher_temp,
                min(cfg.warmup_teacher_temp_epochs, cfg.epochs), cfg.epochs)
            self.mom = cosine_scheduler(cfg.momentum_teacher, 1.0,
                                        cfg.epochs, len(self.loader))
        else:
            self.step = make_byola_train_step(self.mods)
        self.key = jax.random.key(cfg.seed + 1)

    def train_one_epoch(self, epoch: int) -> float:
        import jax
        import numpy as np

        from ssl_audio_tpu.parallel import shard_batch

        self.loader.set_epoch(epoch)
        losses = []
        for i, (lms, _y) in enumerate(self.loader):
            self.key, k = jax.random.split(self.key)
            batch = shard_batch(lms, self.mesh)
            if self.method == "dino":
                it = (epoch - 1) * len(self.loader) + i
                self.state, m = self.step(
                    self.state, batch, k,
                    np.float32(self.temp[epoch - 1]),
                    np.float32(self.mom[it]))
            else:
                self.state, m = self.step(self.state, batch, k,
                                          np.float32(0.0))
            losses.append(m["loss"])
        vals = [float(v) for v in jax.device_get(losses)]
        assert all(np.isfinite(v) for v in vals), "non-finite loss"
        return float(np.mean(vals))


def main(argv=None):
    from ssl_audio_tpu.config import Config, build_argparser, setup_model_defaults

    parser = build_argparser()
    parser.add_argument("--eval", type=str, default="linear",
                        choices=["linear", "knn"])
    # SSL objective family (reference old/main_pretrain.py --method):
    # dino/byola route through the legacy steps for their probe-rise proofs
    parser.add_argument("--method", type=str, default="barlow",
                        choices=["barlow", "dino", "byola"])
    parser.add_argument("--out", type=str, default="learning_proof.json")
    # hard-synthetic difficulty: at these settings a random-init AudioNTT
    # linear probe scores ~0.21 over 20 classes (chance 0.05), leaving
    # headroom for pretraining to close
    parser.add_argument("--n_classes", type=int, default=20)
    # difficulty knobs; None -> per-task defaults (synthetic: the r2
    # hard-task settings; synthetic_multicue: the class defaults)
    parser.add_argument("--env_gain", type=float, default=None)
    parser.add_argument("--env_width", type=float, default=None)
    parser.add_argument("--noise", type=float, default=None)
    # probe every N epochs (the reference's epoch_eval_f protocol,
    # main.py:497-519); 1 = every epoch
    parser.add_argument("--eval_every", type=int, default=1)
    args = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = setup_model_defaults(
        Config(**{k: v for k, v in vars(args).items() if k in known}),
        method=None if args.method == "barlow" else args.method,
    ).replace(no_eval=True)

    import functools

    import jax

    from run_hyperparameter_sweep import get_eval_loaders, probe_score
    from ssl_audio_tpu.train.loop import Trainer

    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    if cfg.dataset == "synthetic":
        from ssl_audio_tpu.data.datasets import SyntheticLMS
        from ssl_audio_tpu.data.pipeline import DataLoader

        hard = functools.partial(
            SyntheticLMS, cfg, n_classes=args.n_classes,
            env_gain=0.5 if args.env_gain is None else args.env_gain,
            env_width=0.25 if args.env_width is None else args.env_width,
            noise=1.0 if args.noise is None else args.noise,
        )
        train_ds = hard(length=cfg.synthetic_steps_per_epoch * cfg.batch_size,
                        seed=cfg.seed)
        trainer = (Trainer(cfg, dataset=train_ds) if args.method == "barlow"
                   else _LegacyTrainerShim(cfg, args.method, train_ds))
        mk = functools.partial(DataLoader, batch_size=cfg.batch_size,
                               shuffle=False, drop_last=False,
                               num_workers=cfg.num_workers)
        eval_loaders = (mk(hard(length=320, seed=990)),
                        mk(hard(length=160, seed=991)),
                        mk(hard(length=160, seed=992)))
        import run_hyperparameter_sweep as sweep_mod

        sweep_mod.CLASSES["synthetic"] = args.n_classes
    elif cfg.dataset == "synthetic_multicue":
        # augmentation-robust task (datasets.SyntheticMultiCue): class =
        # (envelope band, AM rate) jointly — survives RRC/mixup, so the probe
        # should stay >= init through BT-loss saturation (VERDICT r2 #2)
        from ssl_audio_tpu.data.datasets import SyntheticMultiCue
        from ssl_audio_tpu.data.pipeline import DataLoader

        task = functools.partial(
            SyntheticMultiCue, cfg,
            gain=1.2 if args.env_gain is None else args.env_gain,
            env_width=0.09 if args.env_width is None else args.env_width,
            noise=1.0 if args.noise is None else args.noise,
        )
        train_ds = task(length=cfg.synthetic_steps_per_epoch * cfg.batch_size,
                        seed=cfg.seed)
        trainer = (Trainer(cfg, dataset=train_ds) if args.method == "barlow"
                   else _LegacyTrainerShim(cfg, args.method, train_ds))
        mk = functools.partial(DataLoader, batch_size=cfg.batch_size,
                               shuffle=False, drop_last=False,
                               num_workers=cfg.num_workers)
        eval_loaders = (mk(task(length=400, seed=990)),
                        mk(task(length=200, seed=991)),
                        mk(task(length=200, seed=992)))
        import run_hyperparameter_sweep as sweep_mod

        sweep_mod.CLASSES["synthetic_multicue"] = train_ds.n_classes
    else:
        if args.method == "barlow":
            trainer = Trainer(cfg)
        else:
            from ssl_audio_tpu.train.loop import get_train_dataset

            trainer = _LegacyTrainerShim(cfg, args.method,
                                         get_train_dataset(cfg))
        eval_loaders = get_eval_loaders(cfg)

    from ssl_audio_tpu.config import config_fingerprint

    resolved, cfg_hash = config_fingerprint(cfg)
    # stale-artifact guard (VERDICT r4 #7): if --out already holds a proof
    # recorded under a DIFFERENT resolved config, say so loudly — that is
    # exactly how the r4 DINO proof went stale unnoticed.
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if prev.get("config_hash") not in (None, cfg_hash):
                print(f"WARNING: overwriting {args.out} recorded under "
                      f"config {prev['config_hash']} (current: {cfg_hash})")
        except (json.JSONDecodeError, OSError):
            pass
    record = {"config": {"dataset": cfg.dataset, "model_type": cfg.model_type,
                         "batch_size": cfg.batch_size, "epochs": cfg.epochs,
                         "eval": args.eval, "method": args.method},
              "config_hash": cfg_hash,
              "resolved_config": resolved,
              "epochs": []}
    t0 = time.time()
    s = probe_score(cfg, trainer.mods, trainer.state, eval_loaders, args.eval)
    record["epochs"].append({"epoch": 0, "loss": None, "score": s})
    print(f"epoch  0 (random init)  probe={s:.4f}  [{time.time() - t0:.0f}s]")

    for epoch in range(1, cfg.epochs + 1):
        loss = trainer.train_one_epoch(epoch)
        if epoch % args.eval_every and epoch != cfg.epochs:
            continue
        s = probe_score(cfg, trainer.mods, trainer.state, eval_loaders, args.eval)
        record["epochs"].append({"epoch": epoch, "loss": loss, "score": s})
        print(f"epoch {epoch:2d}  loss={loss:.4f}  probe={s:.4f}  "
              f"[{time.time() - t0:.0f}s]")

    init, final = record["epochs"][0]["score"], record["epochs"][-1]["score"]
    best = max(e["score"] for e in record["epochs"][1:])
    record["init_score"] = init
    record["best_score"] = best
    record["learned"] = bool(best > init)
    print(f"probe@init={init:.4f}  probe@best={best:.4f}  "
          f"{'LEARNED' if record['learned'] else 'NO IMPROVEMENT'}")
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    return record


if __name__ == "__main__":
    main()
