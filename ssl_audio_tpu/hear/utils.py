"""HEAR 2021 helper utilities (reference hear/utils.py)."""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
import yaml


class AttrDict(dict):
    """EasyDict-style attribute access for yaml configs."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def load_yaml_config(path_to_config) -> AttrDict:
    path = Path(path_to_config)
    assert path.is_file()
    with open(path) as f:
        return AttrDict(yaml.safe_load(f))


def frame_audio(
    audio: np.ndarray, frame_size: int, hop_size: float, sample_rate: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Slice audio into centered frames every hop_size ms
    (reference hear/utils.py:56-105).

    audio: (n_sounds, n_samples) -> frames (n_sounds, n_frames, frame_size),
    timestamps (n_sounds, n_frames) in ms."""
    audio = np.asarray(audio)
    padded = np.pad(audio, ((0, 0), (frame_size // 2, frame_size - frame_size // 2)))
    num_padded = padded.shape[1]
    frame_step = hop_size / 1000.0 * sample_rate

    starts, timestamps = [], []
    frame_number = 0
    while True:
        start = int(round(frame_number * frame_step))
        if start + frame_size > num_padded:
            break
        starts.append(start)
        timestamps.append(frame_number * frame_step / sample_rate * 1000.0)
        frame_number += 1

    idx = np.asarray(starts)[:, None] + np.arange(frame_size)[None, :]
    frames = padded[:, idx]                                   # (n, T, frame)
    ts = np.broadcast_to(
        np.asarray(timestamps, np.float32)[None], (audio.shape[0], len(starts))
    ).copy()
    return frames.astype(np.float32), ts


def compute_scene_stats(lms_list) -> Tuple[float, float]:
    """Mean of per-clip (mean, std) over already-computed log-mels
    (reference hear/utils.py:20-34)."""
    means = [float(np.mean(l)) for l in lms_list]
    stds = [float(np.std(l)) for l in lms_list]
    return float(np.mean(means)), float(np.mean(stds))


def compute_timestamp_stats(melspec: np.ndarray) -> Tuple[float, float]:
    """Reference hear/utils.py:37-53 — NOTE: the reference divides the global
    mean/std by len(melspec) a second time (a bug), which effectively rescales
    inputs by ~N.  Replicated verbatim because the published HEAR scores were
    produced with this normalization."""
    n = len(melspec)
    return float(melspec.mean() / n), float(melspec.std() / n)
