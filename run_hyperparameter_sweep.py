"""Hyperparameter sweep driver (reference run_hyperparameter_sweep.py).

Uses Optuna (TPE + Hyperband) when installed, mirroring the reference's
sampler/pruner setup (sweep.py:471-543); otherwise falls back to a built-in
random-search + median-rule pruner with the same search space
(sweep.py:68-106: lr, wd, projector layers/out_dim, mixup_ratio,
virtual_crop_scale, mask_beta) and the same short-train -> per-epoch score ->
prune loop.

Example (runs anywhere, no data needed):
    python run_hyperparameter_sweep.py --dataset synthetic --n_trials 4 \
        --train_epochs 2 --batch_size 8 --synthetic_steps_per_epoch 4
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


def sample_space(rng: np.random.Generator, mask: bool) -> Dict:
    """Reference search space (sweep.py:68-106)."""
    params = {
        "lr": float(10 ** rng.uniform(-5, -2)),
        "wd": float(10 ** rng.uniform(-6, -1)),
        "projector_n_hidden_layers": int(rng.integers(1, 3)),
        "projector_out_dim": int(rng.choice([64, 128, 256, 512, 1024, 4096, 8192])),
        "mixup_ratio": float(rng.uniform(0.0, 0.8)),
        "virtual_crop_scale": [1.0, float(rng.uniform(1.0, 2.0))],
    }
    if mask:
        params["mask_beta"] = float(rng.uniform(0.05, 0.8))
    return params


@dataclass
class Trial:
    number: int
    params: Dict
    scores: List[float] = field(default_factory=list)
    pruned: bool = False

    @property
    def best(self) -> float:
        return max(self.scores) if self.scores else float("-inf")


def probe_score(cfg, mods, state) -> float:
    """Per-epoch objective: linear probe on a held-out synthetic split
    (the reference evaluates linear/knn per epoch, sweep.py:166-220)."""
    import jax

    from ssl_audio_tpu.data.datasets import SyntheticLMS
    from ssl_audio_tpu.data.pipeline import DataLoader
    from ssl_audio_tpu.eval.encode import extract_embeddings
    from ssl_audio_tpu.eval.linear import make_embedding_forward
    from ssl_audio_tpu.eval.mlp_clf import MLPClassifier

    forward = make_embedding_forward(
        cfg, mods, jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    ds = SyntheticLMS(cfg, length=128, n_classes=8, seed=999)
    dl = DataLoader(ds, batch_size=32, shuffle=False, drop_last=False, num_workers=2)
    X, Y = extract_embeddings(forward, dl)
    clf = MLPClassifier(hidden_layer_sizes=(256,), max_iter=60, early_stopping=True)
    clf.fit(X[:96], Y[:96])
    return clf.score(X[96:], Y[96:])


def run_trial(base_cfg, params: Dict, trial: Trial, report_cb) -> float:
    from ssl_audio_tpu.train.loop import Trainer

    cfg = base_cfg.replace(**params)
    trainer = Trainer(cfg)
    for epoch in range(1, cfg.epochs + 1):
        trainer.train_one_epoch(epoch)
        score = probe_score(cfg, trainer.mods, trainer.state)
        trial.scores.append(score)
        if report_cb and not report_cb(trial, epoch):
            trial.pruned = True
            break
    return trial.best


def median_pruner(trials: List[Trial], warmup_epochs: int = 1):
    """Prune a trial whose score at epoch e is below the median of completed
    scores at the same epoch (median-rule, the no-optuna fallback)."""

    def cb(trial: Trial, epoch: int) -> bool:
        if epoch <= warmup_epochs:
            return True
        peers = [t.scores[epoch - 1] for t in trials
                 if t is not trial and len(t.scores) >= epoch]
        if len(peers) < 2:
            return True
        return trial.scores[-1] >= float(np.median(peers))

    return cb


def sweep_builtin(cfg, n_trials: int, seed: int = 0) -> List[Trial]:
    rng = np.random.default_rng(seed)
    trials: List[Trial] = []
    pruner = median_pruner(trials)
    for i in range(n_trials):
        trial = Trial(number=i, params=sample_space(rng, cfg.mask))
        trials.append(trial)
        score = run_trial(cfg, trial.params, trial, pruner)
        status = "PRUNED" if trial.pruned else "done"
        print(f"[trial {i}] {status} best={score:.4f} params={trial.params}")
    return trials


def sweep_optuna(cfg, n_trials: int, seed: int = 0):
    import optuna

    def objective(trial):
        params = {
            "lr": trial.suggest_float("lr", 1e-5, 1e-2, log=True),
            "wd": trial.suggest_float("wd", 1e-6, 1e-1, log=True),
            "projector_n_hidden_layers": trial.suggest_int("projector_n_hidden_layers", 1, 2),
            "projector_out_dim": trial.suggest_categorical(
                "projector_out_dim", [64, 128, 256, 512, 1024, 4096, 8192]
            ),
            "mixup_ratio": trial.suggest_float("mixup_ratio", 0.0, 0.8),
            "virtual_crop_scale": [1.0, trial.suggest_float("vcs_t", 1.0, 2.0)],
        }
        t = Trial(number=trial.number, params=params)

        def cb(t_, epoch):
            trial.report(t_.scores[-1], epoch)
            return not trial.should_prune()

        return run_trial(cfg, params, t, cb)

    study = optuna.create_study(
        direction="maximize",
        sampler=optuna.samplers.TPESampler(seed=seed),
        pruner=optuna.pruners.HyperbandPruner(),
    )
    study.optimize(objective, n_trials=n_trials)
    return study


def main(argv=None):
    from ssl_audio_tpu.config import build_argparser, setup_model_defaults, Config
    import dataclasses

    parser = build_argparser()
    parser.add_argument("--n_trials", type=int, default=8)
    parser.add_argument("--train_epochs", type=int, default=3)
    parser.add_argument("--sweep_out", type=str, default="sweep_results.json")
    args = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = setup_model_defaults(
        Config(**{k: v for k, v in vars(args).items() if k in known})
    )
    cfg = cfg.replace(epochs=args.train_epochs, no_eval=True)

    try:
        import optuna  # noqa: F401

        study = sweep_optuna(cfg, args.n_trials)
        best = {"params": study.best_params, "value": study.best_value}
    except ImportError:
        trials = sweep_builtin(cfg, args.n_trials)
        done = [t for t in trials if t.scores]
        best_t = max(done, key=lambda t: t.best)
        best = {"params": best_t.params, "value": best_t.best}

    with open(args.sweep_out, "w") as f:
        json.dump(best, f, indent=2)
    print("BEST:", json.dumps(best))
    return best


if __name__ == "__main__":
    main()
