"""Faithful test double of the optuna API subset `sweep_optuna` uses
(run_hyperparameter_sweep.py:236-260; reference sweep.py:471-543 builds the
same study: TPESampler + HyperbandPruner + optimize(n_trials, callbacks)).

optuna is not installable in this environment, so the suite installs this
module as `sys.modules["optuna"]` to exercise the real sweep_optuna code
path: suggest_* parameter drawing, trial.report/should_prune wiring, the
TrialPruned exception protocol, study bookkeeping (states, best_value over
COMPLETE trials only, intermediate_values), and per-trial callbacks.

Faithfulness bounds (documented, not hidden):
- TPESampler(seed=s): real TPE runs `n_startup_trials=10` seeded-random
  draws before the estimator kicks in, so for the small studies the tests
  run the double's seeded-random sampling IS the real sampler's behavior.
- HyperbandPruner: miniature single-bracket ASHA (eta=3) — prune at a rung
  when the reported value is outside the top 1/eta of values every earlier
  trial reported at that rung.  Same decision surface (trial.report →
  should_prune → TrialPruned), simplified bracket schedule.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, List, Optional

import numpy as np


class TrialPruned(Exception):
    """optuna.TrialPruned: raised by the objective to mark a pruned trial."""


class TrialState:
    COMPLETE = "COMPLETE"
    PRUNED = "PRUNED"


class samplers:
    class TPESampler:
        def __init__(self, seed: Optional[int] = None):
            self.rng = np.random.default_rng(seed)

        def suggest_float(self, lo, hi, log):
            if log:
                return float(np.exp(self.rng.uniform(math.log(lo),
                                                     math.log(hi))))
            return float(self.rng.uniform(lo, hi))

        def suggest_categorical(self, choices):
            return choices[int(self.rng.integers(len(choices)))]


class pruners:
    class HyperbandPruner:
        """Single-bracket ASHA miniature: at rung (epoch) e, keep a trial
        only if its reported value is within the top 1/eta of all values
        previously reported at e (no decision until >=eta peers exist)."""

        def __init__(self, eta: int = 3):
            self.eta = eta
            self.rungs: Dict[int, List[float]] = {}

        def record(self, step: int, value: float):
            self.rungs.setdefault(step, []).append(value)

        def should_prune(self, step: int, value: float) -> bool:
            peers = [v for v in self.rungs.get(step, []) if v is not value]
            if len(peers) < self.eta:
                return False
            cut = float(np.quantile(peers, 1.0 - 1.0 / self.eta))
            return value < cut


@dataclasses.dataclass
class FrozenTrial:
    number: int
    params: Dict
    intermediate_values: Dict[int, float]
    state: str
    value: Optional[float]


class Trial:
    def __init__(self, number: int, study: "Study"):
        self.number = number
        self._study = study
        self.params: Dict = {}
        self.intermediate_values: Dict[int, float] = {}
        self._last_step: Optional[int] = None

    def suggest_float(self, name, lo, hi, log=False):
        v = self._study.sampler.suggest_float(lo, hi, log)
        self.params[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = self._study.sampler.suggest_categorical(choices)
        self.params[name] = v
        return v

    def report(self, value, step):
        self.intermediate_values[step] = float(value)
        self._study.pruner.record(step, float(value))
        self._last_step = step

    def should_prune(self) -> bool:
        if self._last_step is None:
            return False
        return self._study.pruner.should_prune(
            self._last_step, self.intermediate_values[self._last_step])


class Study:
    def __init__(self, direction: str, sampler, pruner):
        assert direction in ("maximize", "minimize")
        self.direction = direction
        self.sampler = sampler
        self.pruner = pruner
        self.trials: List[FrozenTrial] = []

    def optimize(self, objective: Callable, n_trials: int, callbacks=()):
        for i in range(n_trials):
            t = Trial(i, self)
            try:
                value = float(objective(t))
                state = TrialState.COMPLETE
            except TrialPruned:
                value = None
                state = TrialState.PRUNED
            frozen = FrozenTrial(i, dict(t.params),
                                 dict(t.intermediate_values), state, value)
            self.trials.append(frozen)
            for cb in callbacks or ():
                cb(self, frozen)

    @property
    def _best(self) -> FrozenTrial:
        done = [t for t in self.trials if t.state == TrialState.COMPLETE]
        if not done:
            raise ValueError("no completed trials")
        key = (max if self.direction == "maximize" else min)
        return key(done, key=lambda t: t.value)

    @property
    def best_params(self) -> Dict:
        return self._best.params

    @property
    def best_value(self) -> float:
        return self._best.value


def create_study(direction="minimize", sampler=None, pruner=None):
    return Study(direction, sampler or samplers.TPESampler(),
                 pruner or pruners.HyperbandPruner())
