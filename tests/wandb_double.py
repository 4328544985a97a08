"""Faithful test double for the wandb API subset this repo touches.

The repo's wandb surface (utils/logging_utils.py WandbRun, mirroring
reference main.py:359-371 + 161-167 and linear eval logging at reference
run_hyperparameter_sweep.py / main.py): `wandb.init(project=, config=,
name=, settings=)` -> run; `run.log(dict)`; `run.finish()`;
`wandb.Settings(start_method=...)`.

Faithfulness bounds (vs wandb 0.16, local-process behavior only — no
network, no artifacts, no system metrics):
- init() returns a Run and sets the module-level `wandb.run` singleton,
  like the real client; a second concurrent init() reinits (the real
  client warns and returns a new run — we model the return value, not
  the warning).
- run.log(dict) appends a row to run.history and auto-increments
  run.step, matching the real client's default step handling (each log
  call is one history row; an explicit step= merges rows in the real
  client — unused here, unsupported, and asserted against).
- config is snapshotted dict-style: dataclasses/argparse.Namespace via
  vars(), mappings copied — the real client coerces the same way before
  upload.
- finish() marks the run done and clears `wandb.run`.  The real client
  turns post-finish log() calls into a warning + drop; the double raises
  instead, which is STRICTER than real wandb — a test failing here means
  the repo logged after finish, which would silently drop data in
  production.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

run: Optional["Run"] = None          # module singleton, like the real client
_all_runs: List["Run"] = []          # test hook: every run ever inited


class Settings:
    def __init__(self, **kw):
        self.kw = kw


class Run:
    def __init__(self, project: str, config: Any, name: Optional[str]):
        self.project = project
        self.name = name
        self.config = self._snapshot(config)
        self.history: List[Dict[str, Any]] = []
        self.step = 0
        self.finished = False

    @staticmethod
    def _snapshot(config: Any) -> Dict[str, Any]:
        if config is None:
            return {}
        if isinstance(config, dict):
            return dict(config)
        try:
            return dict(vars(config))
        except TypeError:
            return {"value": config}

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        assert step is None, "explicit step= unsupported by the double"
        if self.finished:
            raise RuntimeError(
                "wandb_double: log() after finish() — real wandb would "
                "silently drop this row")
        assert isinstance(metrics, dict)
        self.history.append(dict(metrics))
        self.step += 1

    def finish(self):
        global run
        self.finished = True
        if run is self:
            run = None


def init(project: str = "uncategorized", config: Any = None,
         name: Optional[str] = None, settings: Optional[Settings] = None,
         **_ignored) -> Run:
    global run
    run = Run(project, config, name)
    _all_runs.append(run)
    return run


def reset():
    """Test helper: clear the singleton and the run registry."""
    global run
    run = None
    _all_runs.clear()
