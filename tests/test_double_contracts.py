"""Contract tests pinning the optuna/wandb test doubles to the real
packages (VERDICT r4 #6).

The suite exercises `sweep_optuna` and the wandb logging path against
faithful doubles (tests/optuna_double.py, tests/wandb_double.py) because
the real pip packages are not installable in the build environment.  These
tests run the SAME scenarios against the REAL packages whenever they are
importable, asserting every API touchpoint the doubles model
(create_study/TPESampler/HyperbandPruner/suggest_*/report/should_prune/
TrialPruned/trials bookkeeping; wandb.init/log/finish/run-singleton), so
the doubles cannot silently drift from the real surface.  Skipped — not
failed — where the real package is absent.

Reference use sites: /root/reference/run_hyperparameter_sweep.py has no
optuna; the reference sweep is sweep.py:471-543 (optuna study) and
main.py:363-371 (wandb init/log).
"""
import importlib.util

import pytest

HAS_OPTUNA = importlib.util.find_spec("optuna") is not None
HAS_WANDB = importlib.util.find_spec("wandb") is not None


def _optuna_scenario(optuna):
    """The exact API surface sweep_optuna touches
    (run_hyperparameter_sweep.py:236-260), scripted deterministically:
    4 trials, trial 3 prunes at its first rung."""
    scripted = {0: [0.5, 0.9], 1: [0.4, 0.8], 2: [0.45, 0.85],
                3: [0.1, 0.07]}
    seen = []

    def objective(trial):
        lr = trial.suggest_float("lr", 1e-6, 1e-2, log=True)
        wd = trial.suggest_float("wd", 1e-3, 1e0, log=True)
        nh = trial.suggest_categorical("projector_n_hidden_layers", [1, 2, 3])
        assert 1e-6 <= lr <= 1e-2 and 1e-3 <= wd <= 1e0 and nh in (1, 2, 3)
        best = 0.0
        for epoch, score in enumerate(scripted[trial.number], 1):
            trial.report(score, epoch)
            best = max(best, score)
            if trial.should_prune():
                raise optuna.TrialPruned()
        return best

    study = optuna.create_study(
        direction="maximize",
        sampler=optuna.samplers.TPESampler(seed=0),
        pruner=optuna.pruners.HyperbandPruner(),
    )
    study.optimize(objective, n_trials=4,
                   callbacks=[lambda st, tr: seen.append(tr.number)])
    return study, seen


def _check_optuna_invariants(optuna, study, seen):
    """Invariants both the double and real optuna must satisfy for this
    scenario (values the suite's sweep tests rely on)."""
    assert len(study.trials) == 4
    assert seen == [0, 1, 2, 3]          # callback fired once per trial
    states = [str(t.state).split(".")[-1] for t in study.trials]
    assert all(s in ("COMPLETE", "PRUNED") for s in states)
    assert states[0] == "COMPLETE"
    complete_best = max(
        (t for t in study.trials
         if str(t.state).split(".")[-1] == "COMPLETE"),
        key=lambda t: max(t.intermediate_values.values()))
    assert study.best_value == pytest.approx(
        max(complete_best.intermediate_values.values()))
    # params recorded per trial with the suggested keys
    for t in study.trials:
        assert set(t.params) == {"lr", "wd", "projector_n_hidden_layers"}
        assert t.intermediate_values  # report() populated the rungs


class TestOptunaContract:
    def test_double_satisfies_contract(self):
        import tests.optuna_double as optuna_double

        study, seen = _optuna_scenario(optuna_double)
        _check_optuna_invariants(optuna_double, study, seen)

    @pytest.mark.skipif(not HAS_OPTUNA, reason="real optuna not installed")
    def test_real_optuna_satisfies_contract(self):
        import optuna

        study, seen = _optuna_scenario(optuna)
        _check_optuna_invariants(optuna, study, seen)


def _wandb_scenario(wandb):
    """The exact surface WandbRun + the sweep logging touch
    (utils/logging_utils.py:20-41): init -> run, log rows, finish."""
    run = wandb.init(project="contract-test", config={"lr": 0.1},
                     name="contract")
    assert run is not None
    run.log({"loss": 1.0})
    run.log({"loss": 0.5, "score": 0.9})
    run.finish()
    return run


class TestWandbContract:
    def test_double_satisfies_contract(self):
        import tests.wandb_double as wandb_double

        run = _wandb_scenario(wandb_double)
        # double-specific observability the suite relies on
        assert [row["loss"] for row in run.history] == [1.0, 0.5]
        assert run.finished and wandb_double.run is None

    @pytest.mark.skipif(not HAS_WANDB, reason="real wandb not installed")
    def test_real_wandb_satisfies_contract(self, monkeypatch, tmp_path):
        monkeypatch.setenv("WANDB_MODE", "offline")
        monkeypatch.setenv("WANDB_DIR", str(tmp_path))
        import wandb

        _wandb_scenario(wandb)
        assert wandb.run is None     # finish() cleared the singleton