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
    def __init__(self, cfg, model_type: str, model_file_path: str,
                 fast_mel: bool = False, fetch_dtype: str = "float32",
                 fused_conv: bool | None = None,
                 pool_reorder: bool | None = None,
                 compute_dtype: str = "float32"):
        self.cfg = cfg
        self.sample_rate = cfg.sample_rate
        # fast_mel: HIGH-precision (3-pass bf16) DFT for the feature
        # extraction contract — 1.5e-4 max log-mel error, measurably faster
        # on the timestamp path (PERF.md); exact HIGHEST otherwise
        self.fast_mel = fast_mel
        # fetch_dtype="bfloat16": halve the timestamp-embedding fetch bytes
        # (see hear/vit.py _timestamp_pipeline)
        self.fetch_dtype = fetch_dtype
        # compute_dtype="bfloat16": run the encoder forward in bf16 (params +
        # input cast once at load, fp32 outputs) — the eval conv stack is
        # HBM-bound (PERF.md conv-call trace: block-1 materializations at the
        # roofline), so halving activation bytes converts directly to device
        # time, the same asymmetry --use_fp16 shows in training (+47%).
        # Embeddings shift by bf16 rounding; opt-in.
        self.compute_dtype = compute_dtype
        if model_type == "resnet50":
            self.model = resnet_lib.resnet50()
        elif model_type == "resnet50_ReGP_NRF":
            self.model = resnet_lib.resnet50_ReGP_NRF()
        elif model_type == "resnet18":
            self.model = resnet_lib.resnet18()
        elif model_type == "resnet18_ReGP_NRF":
            self.model = resnet_lib.resnet18_ReGP_NRF()
        elif model_type == "audiontt":
            # fused_conv here = the EVAL-mode Pallas block; default OFF —
            # the staged device-only A/B (2026-08-18, PERF.md) measures it
            # +3.6% (332.3 vs 320.9 clips/s, inside the ±5% band), and it
            # composes NEGATIVELY with compute_dtype="bfloat16" (361.8 vs
            # 399.1).  Opt-in only.
            # pool_reorder = the XLA-level monotone pool-before-BN eval
            # path (models/audiontt.py pool_reorder_eval): default OFF —
            # the staged device-only A/B (2026-08-18, PERF.md) measures it
            # NEUTRAL on the timestamp surface (316.9 vs 320.9 clips/s);
            # the forward-only XLA composition is already near the HBM
            # roofline, so there is nothing for the reorder to save at eval.
            self.model = audiontt_lib.AudioNTT2022(
                fused_conv_eval=bool(fused_conv),
                pool_reorder_eval=bool(pool_reorder))
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
        if compute_dtype == "bfloat16":
            # Cast only the params collection; BN running stats stay fp32
            # (standard mixed precision — torch AMP runs batch_norm in fp32
            # too, so the reference's fp16-trained models normalize in fp32;
            # ADVICE r3: bf16 running variance adds a systematic per-channel
            # scale error on top of activation rounding).  flax's BatchNorm
            # promotes to the widest operand dtype, so the fp32 stats also
            # mean the eval normalization itself computes in fp32.
            self.variables = dict(
                self.variables,
                params=jax.tree.map(
                    lambda p: p.astype(jnp.bfloat16)
                    if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
                    self.variables["params"]))
        self._apply = jax.jit(
            lambda variables, x: self.model.apply(
                variables, x.astype(jnp.bfloat16)
                if compute_dtype == "bfloat16" else x,
                train=False).astype(jnp.float32)
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
        return log_mel_spectrogram(
            jnp.asarray(batch_audio), self.mel, self.fast_mel
        )[:, None]

    def to(self, device):
        return self

    def eval(self):
        return self


def load_model(
    model_file_path: str = "",
    model_type: str = "audiontt",
    cfg_path: str = "hear/config.yaml",
    fast_mel: bool = False,
    fetch_dtype: str = "float32",
    fused_conv: bool | None = None,
    pool_reorder: bool | None = None,
    compute_dtype: str = "float32",
) -> ConvModelWrapper:
    cfg = utils.load_yaml_config(_resolve_cfg_path(cfg_path))
    return ConvModelWrapper(cfg, model_type, model_file_path,
                            fast_mel=fast_mel, fetch_dtype=fetch_dtype,
                            fused_conv=fused_conv, pool_reorder=pool_reorder,
                            compute_dtype=compute_dtype)


def get_timestamp_embeddings(
    audio_list: List,
    model: ConvModelWrapper,
    frame_duration: float = TIMESTAMP_FRAME_DUR,
    hop_size: float = TIMESTAMP_HOP_SIZE,
    cfg_path: str = "hear/config.yaml",
) -> Tuple[torch.Tensor, torch.Tensor]:
    audio = _as_numpy(audio_list)
    cfg = model.cfg
    frame_size = int((frame_duration / 1000) * cfg.sample_rate)
    from ssl_audio_tpu.hear.vit import _frame_audio_on_device

    flat, timestamps, N = _frame_audio_on_device(
        audio, frame_size, hop_size, cfg.sample_rate
    )
    n_sounds = audio.shape[0]
    n_frames = N // n_sounds

    # single-jit device pipeline (see hear/vit.py _timestamp_pipeline)
    from ssl_audio_tpu.hear.vit import _fetch_embeddings, _timestamp_pipeline

    bf16 = getattr(model, "compute_dtype", "float32") == "bfloat16"

    def encode_fn(variables, m):
        if bf16:
            m = m.astype(jnp.bfloat16)
        out = model.model.apply(variables, m, train=False)
        return out.astype(jnp.float32)

    emb = _fetch_embeddings(_timestamp_pipeline(model, flat, N,
                                                encode_fn=encode_fn))
    emb = emb[:N].reshape(n_sounds, n_frames, -1)
    return torch.from_numpy(emb).float(), timestamps


def get_scene_embeddings(
    audio_list: List,
    model: ConvModelWrapper,
    cfg_path: str = "hear/config.yaml",
) -> torch.Tensor:
    """Per-clip: mel -> scene-stats normalize -> single conv forward
    (reference conv.py:179-216)."""
    try:
        audio = _as_numpy(audio_list)
        ragged = False
    except ValueError:
        ragged = True
    if ragged:
        # variable-length clip list: reference-style per-clip loop
        lms_list = [np.asarray(model.to_feature(_as_numpy(a)[None]))[0]
                    for a in audio_list]
        mean, std = utils.compute_scene_stats(lms_list)
        embs = [np.asarray(model.forward((jnp.asarray(l)[None] - mean) / std))
                for l in lms_list]
        return torch.from_numpy(np.concatenate(embs)).float()

    # equal-length clips (the heareval case): one batched mel + batched
    # forwards (the reference loops clip-by-clip, conv.py:179-216; batching
    # is exact here)
    lms = model.to_feature(audio)                              # (B, 1, F, T)
    per_clip_mean = lms.mean(axis=(1, 2, 3))
    per_clip_std = lms.std(axis=(1, 2, 3), ddof=1)             # torch .std()
    mean = per_clip_mean.mean()                                # scene stats
    std = per_clip_std.mean()                                  # (utils.py:20-34)
    embs = []
    for i in range(0, lms.shape[0], BATCH_SIZE):
        x = (lms[i : i + BATCH_SIZE] - mean) / std
        embs.append(np.asarray(model.forward(x)))
    return torch.from_numpy(np.concatenate(embs)).float()
