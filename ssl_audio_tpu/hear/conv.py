"""HEAR 2021 API for conv encoders — resnet*/audiontt
(reference hear/sample/conv.py)."""
from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import torch

import ssl_audio_tpu.hear.utils as utils
from ssl_audio_tpu.hear.vit import (
    BATCH_SIZE,
    TIMESTAMP_FRAME_DUR,
    TIMESTAMP_HOP_SIZE,
    _as_numpy,
    _resolve_cfg_path,
)
from ssl_audio_tpu.models import audiontt as audiontt_lib
from ssl_audio_tpu.models import resnet as resnet_lib
from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram


class ConvModelWrapper:
    def __init__(self, cfg, model_type: str, model_file_path: str):
        self.cfg = cfg
        self.sample_rate = cfg.sample_rate
        if model_type == "resnet50":
            self.model = resnet_lib.resnet50()
        elif model_type == "resnet50_ReGP_NRF":
            self.model = resnet_lib.resnet50_ReGP_NRF()
        elif model_type == "resnet18":
            self.model = resnet_lib.resnet18()
        elif model_type == "resnet18_ReGP_NRF":
            self.model = resnet_lib.resnet18_ReGP_NRF()
        elif model_type == "audiontt":
            self.model = audiontt_lib.AudioNTT2022()
        else:
            raise NotImplementedError(f"Model type {model_type} is not supported")
        self.model_type = model_type
        self.embed_dim = self.model.embed_dim
        self.scene_embedding_size = self.embed_dim
        self.timestamp_embedding_size = self.embed_dim
        self.mel = MelSpec(
            sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, win_length=cfg.win_length,
            hop_length=cfg.hop_length, n_mels=cfg.n_mels,
            f_min=float(cfg.f_min), f_max=float(cfg.f_max),
        )
        self.variables = self._load_weights(model_file_path)
        self._apply = jax.jit(
            lambda variables, x: self.model.apply(variables, x, train=False)
        )

    def _load_weights(self, model_file_path: str):
        x = jnp.zeros((1, 1, self.cfg.n_mels, 96))
        variables = self.model.init({"params": jax.random.key(0)}, x, train=False)
        if not model_file_path:
            return variables
        if model_file_path.endswith((".pth", ".pt")):
            from ssl_audio_tpu.utils.torch_import import load_torch_conv_variables

            return load_torch_conv_variables(
                model_file_path, variables, self.model_type
            )
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        raw = ckptr.restore(os.path.abspath(model_file_path))
        if "state" in raw:
            out = {"params": raw["state"]["params"]["encoder"]}
            bs = raw["state"].get("batch_stats", {}).get("encoder")
            if bs:
                out["batch_stats"] = bs
        elif "params" in raw:
            out = {k: v for k, v in raw.items() if k in ("params", "batch_stats")}
        else:
            raise ValueError(f"Unrecognized checkpoint layout at {model_file_path}")
        return jax.tree.map(jnp.asarray, out)

    def forward(self, lms: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.variables, lms)

    def to_feature(self, batch_audio: np.ndarray) -> jnp.ndarray:
        return log_mel_spectrogram(jnp.asarray(batch_audio), self.mel)[:, None]

    def to(self, device):
        return self

    def eval(self):
        return self


def load_model(
    model_file_path: str = "",
    model_type: str = "audiontt",
    cfg_path: str = "hear/config.yaml",
) -> ConvModelWrapper:
    cfg = utils.load_yaml_config(_resolve_cfg_path(cfg_path))
    return ConvModelWrapper(cfg, model_type, model_file_path)


def get_timestamp_embeddings(
    audio_list: List,
    model: ConvModelWrapper,
    frame_duration: float = TIMESTAMP_FRAME_DUR,
    hop_size: float = TIMESTAMP_HOP_SIZE,
    cfg_path: str = "hear/config.yaml",
) -> Tuple[torch.Tensor, torch.Tensor]:
    audio = _as_numpy(audio_list)
    cfg = model.cfg
    frames, timestamps = utils.frame_audio(
        audio,
        frame_size=int((frame_duration / 1000) * cfg.sample_rate),
        hop_size=hop_size,
        sample_rate=cfg.sample_rate,
    )
    n_sounds, n_frames, _ = frames.shape
    flat = frames.reshape(n_sounds * n_frames, -1)

    mels = []
    for i in range(0, len(flat), BATCH_SIZE):
        mels.append(np.asarray(model.to_feature(flat[i : i + BATCH_SIZE])))
    mel = np.concatenate(mels)
    mean, std = utils.compute_timestamp_stats(mel)
    mel = (mel - mean) / std

    embs = []
    for i in range(0, len(mel), BATCH_SIZE):
        embs.append(np.asarray(model.forward(jnp.asarray(mel[i : i + BATCH_SIZE]))))
    emb = np.concatenate(embs).reshape(n_sounds, n_frames, -1)
    return torch.from_numpy(emb).float(), torch.from_numpy(timestamps).float()


def get_scene_embeddings(
    audio_list: List,
    model: ConvModelWrapper,
    cfg_path: str = "hear/config.yaml",
) -> torch.Tensor:
    """Per-clip: mel -> scene-stats normalize -> single conv forward
    (reference conv.py:179-216)."""
    audio = _as_numpy(audio_list)
    lms_list = [np.asarray(model.to_feature(a[None]))[0] for a in audio]
    mean, std = utils.compute_scene_stats(lms_list)
    embs = []
    for lms in lms_list:
        x = (jnp.asarray(lms)[None] - mean) / std             # (1, 1, F, T)
        embs.append(np.asarray(model.forward(x)))
    return torch.from_numpy(np.concatenate(embs)).float()
