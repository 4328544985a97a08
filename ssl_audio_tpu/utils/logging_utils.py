"""CSV + (optional) wandb metric logging, preserving the reference's CSV line
format for parity diffing (main.py:158-167: 'epoch,{e},step,{s},loss,{l}')."""
from __future__ import annotations

import logging
import os
from typing import Optional


def make_csv_logger(log_dir: str, name: str = "log.csv") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"ssl_audio_tpu.{log_dir}")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if not logger.handlers:
        logger.addHandler(logging.FileHandler(os.path.join(log_dir, name), mode="a"))
    return logger


class WandbRun:
    """Thin optional wandb wrapper; silently no-ops when wandb is missing."""

    def __init__(self, project: str, config=None, name: Optional[str] = None,
                 enabled: bool = True):
        self._run = None
        if not enabled:
            return
        try:
            import wandb

            self._run = wandb.init(project=project, config=config, name=name)
        except Exception:
            self._run = None

    def log(self, metrics: dict):
        if self._run is not None:
            self._run.log(metrics)

    def finish(self):
        if self._run is not None:
            self._run.finish()
