"""Hyperparameter sweep driver (reference run_hyperparameter_sweep.py).

Protocol per trial (reference sweep.py:54-146): short pretrain on the chosen
dataset; after EVERY epoch extract real embeddings from the eval train/val/
test splits and score a linear probe (TorchMLPClassifier, hidden=(), 100
iters) or the weighted-cosine kNN; report the per-epoch score to the pruner.

Datasets (reference get_data, sweep.py:362-437): `nsynth` = NSynth-50h HEAR
(norm stats [-8.82, 7.03], 88 pitch classes), `fsd50k` (200 classes).
`synthetic` remains as a no-data-on-disk fallback with the same protocol over
the synthetic probe splits.

Uses Optuna (TPE + Hyperband + optional wandb callback) when installed,
mirroring the reference's setup (sweep.py:471-543); otherwise a built-in
random-search + median-rule pruner over the same search space
(sweep.py:68-106 + 369-380: lr, wd, projector layers/out_dim, mixup_ratio,
virtual_crop_scale, mask_beta).

Example (runs anywhere, no data needed):
    python run_hyperparameter_sweep.py --dataset synthetic --n_trials 4 \
        --train_epochs 2 --batch_size 8 --synthetic_steps_per_epoch 4
"""
from __future__ import annotations

import csv
import functools
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

# number of probe classes per dataset (reference sweep.py:48-51)
CLASSES = dict(fsd50k=200, nsynth=88, synthetic=8)

HYPERPARAMETERS = [
    "lr", "wd", "projector_n_hidden_layers", "projector_out_dim",
    "mixup_ratio", "virtual_crop_scale", "mask_beta",
]


def sample_space(rng: np.random.Generator, tune: List[str]) -> Dict:
    """Reference search space (sweep.py:66-106 optimizer block +
    define_model:148-152 + get_*_50h:369-380)."""
    params: Dict = {}
    if "lr" in tune:
        params["lr"] = float(10 ** rng.uniform(-6, -2))
    if "wd" in tune:
        params["wd"] = float(10 ** rng.uniform(-3, 0))
    if "projector_n_hidden_layers" in tune:
        params["projector_n_hidden_layers"] = int(rng.choice([1, 2, 3]))
    if "projector_out_dim" in tune:
        params["projector_out_dim"] = int(
            rng.choice([64, 128, 256, 1024, 4096, 8192, 16384])
        )
    if "mixup_ratio" in tune:
        params["mixup_ratio"] = float(rng.choice([0, 0.2, 0.4, 0.6, 0.8]))
    if "virtual_crop_scale" in tune:
        params["virtual_crop_scale"] = [
            float(rng.choice([1, 1.2, 1.4, 1.6, 1.8])),
            float(rng.choice([1, 1.2, 1.4, 1.6, 1.8])),
        ]
    if "mask_beta" in tune:
        params["mask_beta"] = float(rng.uniform(0.05, 0.5))
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


def get_eval_loaders(cfg, data_dir="data"):
    """Transform-free eval splits (reference get_nsynth_50h / get_fsd50k,
    sweep.py:369-437): (train, val, test) loaders."""
    from ssl_audio_tpu.data import datasets as D
    from ssl_audio_tpu.data.pipeline import DataLoader

    mk = functools.partial(
        DataLoader, batch_size=cfg.batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.num_workers,
    )
    if cfg.dataset == "nsynth":
        norm = D.NORM_STATS["nsynth"]
        return tuple(
            mk(D.NSynthHEAR(cfg, split=s, norm_stats=norm, data_dir=data_dir))
            for s in ("train", "valid", "test")
        )
    if cfg.dataset == "fsd50k":
        norm = D.NORM_STATS["fsd50k"]
        return tuple(
            mk(D.FSD50K(cfg, split=s, norm_stats=norm, data_dir=data_dir))
            for s in ("train", "val", "test")
        )
    if cfg.dataset == "synthetic":
        # no-data fallback: disjoint synthetic splits with class structure
        n = CLASSES["synthetic"]
        return tuple(
            mk(D.SyntheticLMS(cfg, length=ln, n_classes=n, seed=sd))
            for ln, sd in ((96, 990), (48, 991), (48, 992))
        )
    raise ValueError(f"sweep does not support --dataset {cfg.dataset}")


def probe_score(cfg, mods, state, eval_loaders, eval_mode: str = "linear") -> float:
    """Per-epoch objective on REAL probe data (reference evaluate/
    eval_linear/eval_knn, sweep.py:165-275)."""
    import jax

    from ssl_audio_tpu.eval.encode import extract_embeddings
    from ssl_audio_tpu.eval.knn import eval_knn
    from ssl_audio_tpu.eval.linear import make_embedding_forward
    from ssl_audio_tpu.eval.mlp_clf import MLPClassifier

    forward = make_embedding_forward(
        cfg, mods, jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    train_loader, val_loader, test_loader = eval_loaders
    n_classes = CLASSES[cfg.dataset]
    if eval_mode == "knn":
        top1, _ = eval_knn(forward, train_loader, test_loader, n_classes)
        return top1 / 100.0
    X_train, y_train = extract_embeddings(forward, train_loader)
    X_val, y_val = extract_embeddings(forward, val_loader)
    X_test, y_test = extract_embeddings(forward, test_loader)
    # reference eval_linear (sweep.py:247-275): pure linear readout
    clf = MLPClassifier(
        hidden_layer_sizes=(), max_iter=100, early_stopping=True,
        n_iter_no_change=10,
    )
    clf.fit(X_train, y_train, X_val=X_val, y_val=y_val)
    return clf.score(X_test, y_test)


def run_trial(base_cfg, params: Dict, trial: Trial, report_cb,
              eval_mode: str = "linear", data_dir: str = "data") -> float:
    from ssl_audio_tpu.train.loop import Trainer

    cfg = base_cfg.replace(**params)
    trainer = Trainer(cfg, data_dir=data_dir)
    eval_loaders = get_eval_loaders(cfg, data_dir)
    for epoch in range(1, cfg.epochs + 1):
        trainer.train_one_epoch(epoch)
        score = probe_score(cfg, trainer.mods, trainer.state, eval_loaders, eval_mode)
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


def sweep_builtin(cfg, n_trials: int, tune: List[str], eval_mode: str,
                  seed: int = 0, data_dir: str = "data") -> List[Trial]:
    rng = np.random.default_rng(seed)
    trials: List[Trial] = []
    pruner = median_pruner(trials)
    for i in range(n_trials):
        trial = Trial(number=i, params=sample_space(rng, tune))
        trials.append(trial)
        score = run_trial(cfg, trial.params, trial, pruner, eval_mode, data_dir)
        status = "PRUNED" if trial.pruned else "done"
        print(f"[trial {i}] {status} best={score:.4f} params={trial.params}")
    return trials


def _optuna_params(trial, tune: List[str]) -> Dict:
    """Reference suggest_* calls (sweep.py:66-106,148-152,369-380)."""
    params: Dict = {}
    if "lr" in tune:
        params["lr"] = trial.suggest_float("lr", 1e-6, 1e-2, log=True)
    if "wd" in tune:
        params["wd"] = trial.suggest_float("wd", 1e-3, 1e0, log=True)
    if "projector_n_hidden_layers" in tune:
        params["projector_n_hidden_layers"] = trial.suggest_categorical(
            "projector_n_hidden_layers", [1, 2, 3]
        )
    if "projector_out_dim" in tune:
        params["projector_out_dim"] = trial.suggest_categorical(
            "projector_out_dim", [64, 128, 256, 1024, 4096, 8192, 16384]
        )
    if "mixup_ratio" in tune:
        params["mixup_ratio"] = trial.suggest_categorical(
            "mixup_ratio", [0, 0.2, 0.4, 0.6, 0.8]
        )
    if "virtual_crop_scale" in tune:
        params["virtual_crop_scale"] = [
            trial.suggest_categorical("virtual_crop_scale_F", [1, 1.2, 1.4, 1.6, 1.8]),
            trial.suggest_categorical("virtual_crop_scale_T", [1, 1.2, 1.4, 1.6, 1.8]),
        ]
    if "mask_beta" in tune:
        params["mask_beta"] = trial.suggest_float("mask_beta", 0.05, 0.5)
    return params


def _wandb_callbacks(cfg, tune: List[str], n_trials: int):
    """Optuna wandb callback when available (reference sweep.py:481-491)."""
    try:
        import wandb
        from optuna.integration.wandb import WeightsAndBiasesCallback

        return [WeightsAndBiasesCallback(
            metric_name="score",
            wandb_kwargs=dict(
                project=f"Hyperparameter sweep {cfg.model_type} [{cfg.dataset}]",
                name=f"{'_'.join(tune)} - {n_trials} trials",
            ),
        )]
    except Exception:
        return []


def sweep_optuna(cfg, n_trials: int, tune: List[str], eval_mode: str,
                 seed: int = 0, data_dir: str = "data"):
    import optuna

    def objective(trial):
        params = _optuna_params(trial, tune)
        t = Trial(number=trial.number, params=params)

        def cb(t_, epoch):
            trial.report(t_.scores[-1], epoch)
            return not trial.should_prune()

        score = run_trial(cfg, params, t, cb, eval_mode, data_dir)
        if t.pruned:
            raise optuna.TrialPruned()
        return score

    study = optuna.create_study(
        direction="maximize",
        sampler=optuna.samplers.TPESampler(seed=seed),
        pruner=optuna.pruners.HyperbandPruner(),
    )
    study.optimize(objective, n_trials=n_trials,
                   callbacks=_wandb_callbacks(cfg, tune, n_trials))
    return study


def save_intermediate_values(rows: List[List], save_path: str):
    """intermediate_values.csv (+ .png when matplotlib is available) —
    reference plot_and_save_intermediate_values (sweep.py:445-467).
    rows: [trial_number, k1, v1, k2, v2, ..., score_ep1, score_ep2, ...]"""
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "intermediate_values.csv"), "w") as f:
        csv.writer(f).writerows(rows)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for row in rows:
            n_kv = next((i for i, v in enumerate(row[1:], 1)
                         if not isinstance(v, str)), len(row))
            scores = [v for v in row[n_kv:] if isinstance(v, (int, float))]
            label = ",".join(f"{row[i]}={row[i + 1]}" for i in range(1, n_kv - 1, 2))
            plt.plot(range(1, len(scores) + 1), scores, marker="o", label=label)
        plt.xlabel("Epoch")
        plt.ylabel("Score")
        plt.title("Intermediate scores")
        plt.legend(bbox_to_anchor=(1.05, 1.0), loc="upper left", fontsize=6)
        plt.tight_layout()
        plt.savefig(os.path.join(save_path, "intermediate_values.png"),
                    bbox_inches="tight")
        plt.close()
    except Exception:
        pass  # headless image-less environment: CSV is the artifact


def _trial_rows(trials: List[Trial]) -> List[List]:
    rows = []
    for t in trials:
        kv = [q for p in t.params.items() for q in p]
        rows.append([t.number] + kv + list(t.scores))
    return rows


def main(argv=None):
    from ssl_audio_tpu.config import build_argparser, setup_model_defaults, Config
    import dataclasses

    parser = build_argparser()
    parser.add_argument("--eval", type=str, default="linear",
                        choices=["linear", "knn"])
    parser.add_argument("--tune", nargs="+", type=str, default=["lr", "wd"],
                        choices=HYPERPARAMETERS)
    parser.add_argument("--n_trials", type=int, default=8)
    parser.add_argument("--train_epochs", type=int, default=3)
    parser.add_argument("--sweep_out", type=str, default="sweep_results.json")
    parser.add_argument("--data_dir", type=str, default="data")
    args = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = setup_model_defaults(
        Config(**{k: v for k, v in vars(args).items() if k in known})
    )
    cfg = cfg.replace(epochs=args.train_epochs, no_eval=True)

    log_dir = os.path.join("logs", "hparams", cfg.dataset, cfg.model_type)
    try:
        import optuna  # noqa: F401

        study = sweep_optuna(cfg, args.n_trials, args.tune, args.eval,
                             data_dir=args.data_dir)
        best = {"params": study.best_params, "value": study.best_value}
        rows = []
        for t in study.trials:
            if t.intermediate_values:
                kv = [q for p in t.params.items() for q in p]
                ys = [y for _, y in sorted(t.intermediate_values.items())]
                rows.append([t.number] + kv + ys)
        save_intermediate_values(rows, log_dir)
    except ImportError:
        trials = sweep_builtin(cfg, args.n_trials, args.tune, args.eval,
                               data_dir=args.data_dir)
        done = [t for t in trials if t.scores]
        best_t = max(done, key=lambda t: t.best)
        best = {"params": best_t.params, "value": best_t.best}
        save_intermediate_values(_trial_rows(trials), log_dir)

    with open(args.sweep_out, "w") as f:
        json.dump(best, f, indent=2)
    print("BEST:", json.dumps(best))
    return best


if __name__ == "__main__":
    main()
