"""HEAR 2021 API for ViT encoders (reference hear/sample/vit.py).

Public contract (hearbenchmark.com/hear-api): load_model,
get_scene_embeddings, get_timestamp_embeddings — torch tensors in and out so
the external heareval harness runs unmodified; compute runs in JAX on
TPU/CPU underneath.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import torch

import ssl_audio_tpu.hear.utils as utils
from ssl_audio_tpu.models import vit as vit_lib
from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram

# Default frame duration / hop in ms, and inference batch size
TIMESTAMP_FRAME_DUR = 950
TIMESTAMP_HOP_SIZE = 50
BATCH_SIZE = 512

_DEFAULT_CFG = os.path.join(os.path.dirname(__file__), "config.yaml")


def _resolve_cfg_path(cfg_path: str) -> str:
    return cfg_path if os.path.isfile(cfg_path) else _DEFAULT_CFG


class ViTModelWrapper:
    """Holds the Flax ViT, its params, and the HEAR metadata attributes."""

    def __init__(self, cfg, model_type: str, model_file_path: str, patch_size,
                 fetch_dtype: str = "float32", fast_mel: bool = False,
                 compute_dtype: str = "float32"):
        self.cfg = cfg
        # fast_mel: HIGH-precision (3-pass bf16) DFT, ~2e-4 max log-mel err
        # (the same feature-extraction contract the conv wrapper exposes)
        self.fast_mel = fast_mel
        # compute_dtype="bfloat16": run the encoder forward in bf16 (params
        # cast once at load, batch_stats kept fp32 — same mixed-precision
        # contract as the conv wrapper; models/vit.py keeps the pos-embed
        # adds dtype-preserving and the softmax in f32).  Embeddings shift
        # by bf16 rounding; opt-in.
        self.compute_dtype = compute_dtype
        self.use_cls = True if cfg.get("use_cls") is None else cfg.use_cls
        self.sample_rate = cfg.sample_rate
        self.fetch_dtype = fetch_dtype
        c = "vitc" in model_type
        size = model_type.split("_")[-1]
        self.model = vit_lib.get_mae_vit(size, patch_size, c)
        self.embed_dim = self.model.embed_dim
        self.scene_embedding_size = self.embed_dim
        self.timestamp_embedding_size = self.embed_dim * self.model.grid_size()[0]
        self.mel = MelSpec(
            sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, win_length=cfg.win_length,
            hop_length=cfg.hop_length, n_mels=cfg.n_mels,
            f_min=float(cfg.f_min), f_max=float(cfg.f_max),
        )
        self.variables = self._load_weights(model_file_path)
        if compute_dtype == "bfloat16":
            # params only; conv-stem ViTs keep BN running stats fp32 (flax
            # BatchNorm still emits bf16 outputs for bf16 inputs/params)
            self.variables = dict(
                self.variables,
                params=jax.tree.map(
                    lambda p: p.astype(jnp.bfloat16)
                    if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
                    self.variables["params"]))
        self.params = self.variables["params"]
        self._unit_apply = jax.jit(self._unit_apply_impl)

    def _load_weights(self, model_file_path: str):
        """Returns the full variables dict ({'params', ['batch_stats']}) —
        conv-stem ViTs carry BatchNorm running stats."""
        x = jnp.zeros((1, 1, self.cfg.n_mels, self.model.img_size[1]))
        variables = dict(
            self.model.init({"params": jax.random.key(0)}, x, train=False)
        )
        if not model_file_path:
            return variables
        if model_file_path.endswith(".pth") or model_file_path.endswith(".pt"):
            from ssl_audio_tpu.utils.torch_import import load_torch_vit_params

            if "batch_stats" in variables:
                params, bstats = load_torch_vit_params(
                    model_file_path, variables["params"], variables["batch_stats"]
                )
                return {"params": params, "batch_stats": bstats}
            return {"params": load_torch_vit_params(model_file_path, variables["params"])}
        # Orbax checkpoint: full TrainState or params-only
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        raw = ckptr.restore(os.path.abspath(model_file_path))
        out = {}
        if "state" in raw:
            out["params"] = raw["state"]["params"]["encoder"]
            bs = raw["state"].get("batch_stats", {}).get("encoder")
            if bs:
                out["batch_stats"] = bs
        elif "params" in raw:
            tree = raw["params"]
            out["params"] = tree.get("encoder", tree)
            bs = raw.get("batch_stats", {})
            if isinstance(bs, dict) and bs.get("encoder"):
                out["batch_stats"] = bs["encoder"]
        else:
            raise ValueError(f"Unrecognized checkpoint layout at {model_file_path}")
        return jax.tree.map(jnp.asarray, out)

    # -- jitted unit encoder -------------------------------------------
    def _unit_apply_impl(self, variables, xu):
        if self.compute_dtype == "bfloat16":
            xu = xu.astype(jnp.bfloat16)
        out = self.model.apply(variables, xu, train=False)
        return out.astype(jnp.float32)

    def encode_lms(self, lms: jnp.ndarray) -> jnp.ndarray:
        """(B, 1, F, T) -> (B, U, D) per-unit CLS tokens
        (reference vit.py:109-126)."""
        from ssl_audio_tpu.eval.encode import encode_lms_units

        return encode_lms_units(
            lambda xu, _ra: self._unit_apply(self.variables, xu),
            lms, self.model.img_size[1],
        )

    def to_feature(self, batch_audio: np.ndarray) -> jnp.ndarray:
        """(B, L) wav -> (B, 1, n_mels, T) log-mel."""
        lms = log_mel_spectrogram(jnp.asarray(batch_audio), self.mel,
                                  fast=self.fast_mel)
        return lms[:, None]

    def encode(self, batch_audio: np.ndarray) -> jnp.ndarray:
        x = self.to_feature(batch_audio)
        # reference _normalize_batch (vit.py:100-103) uses torch .std(),
        # which is the UNBIASED estimator -> ddof=1.  Stats stay DEVICE
        # scalars — fetching them to host here forced an extra round trip
        # (dispatch + fetch) in the middle of every scene call.
        mu, sigma = x.mean(), x.std(ddof=1)
        x = (x - mu) / sigma
        return self.encode_lms(x)

    # heareval-compat no-ops
    def to(self, device):
        return self

    def eval(self):
        return self


def load_model(
    model_file_path: str = "",
    model_type: str = "vitc_base",
    patch_size: str = "16x8",
    cfg_path: str = "hear/config.yaml",
    fetch_dtype: str = "float32",
    fast_mel: bool = False,
    compute_dtype: str = "float32",
) -> ViTModelWrapper:
    """fetch_dtype="bfloat16" halves the timestamp-embedding device->host
    transfer (the wall-clock bottleneck on remote-attached TPUs) at the
    cost of rounding the returned embeddings to bf16 precision.
    compute_dtype="bfloat16" runs the encoder forward itself in bf16
    (params cast at load; embeddings within bf16 rounding of fp32)."""
    cfg = utils.load_yaml_config(_resolve_cfg_path(cfg_path))
    ps = [int(patch_size.split("x")[0]), int(patch_size.split("x")[-1])]
    return ViTModelWrapper(cfg, model_type, model_file_path, ps,
                           fast_mel=fast_mel,
                           fetch_dtype=fetch_dtype,
                           compute_dtype=compute_dtype)


def _as_numpy(audio) -> np.ndarray:
    if isinstance(audio, torch.Tensor):
        return audio.detach().cpu().numpy()
    if isinstance(audio, (list, tuple)):
        return np.stack([_as_numpy(a) for a in audio])
    return np.asarray(audio)


def _frame_audio_on_device(
    audio: np.ndarray, frame_size: int, hop_size: float, sample_rate: int
):
    """Device-side frame_audio (same windows/timestamps as
    hear/utils.py:56-105): the audio uploads ONCE; the 19x-overlapped
    (n_sounds*n_frames, frame_size) window tensor is a static gather on
    device instead of an n_frames-times-larger host upload.

    Returns (flat_frames_device [padded to a BATCH_SIZE multiple],
    timestamps (n_sounds, n_frames), N real rows)."""
    n_sounds, n_samples = audio.shape
    pad_l = frame_size // 2
    pad_r = frame_size - pad_l
    num_padded = n_samples + frame_size
    frame_step = hop_size / 1000.0 * sample_rate
    starts, ts = [], []
    i = 0
    while True:
        start = int(round(i * frame_step))
        if start + frame_size > num_padded:
            break
        starts.append(start)
        ts.append(i * frame_step / sample_rate * 1000.0)
        i += 1
    n_frames = len(starts)
    x = jnp.pad(jnp.asarray(audio), ((0, 0), (pad_l, pad_r)))
    idx = np.asarray(starts)[:, None] + np.arange(frame_size)[None, :]
    frames = x[:, idx]                                         # (S, F, frame)
    flat = frames.reshape(n_sounds * n_frames, frame_size)
    N = flat.shape[0]
    n_pad = (-N) % BATCH_SIZE
    if n_pad:
        flat = jnp.pad(flat, ((0, n_pad), (0, 0)))
    timestamps = np.broadcast_to(
        np.asarray(ts, np.float32)[None], (n_sounds, n_frames)
    ).copy()
    return flat, torch.from_numpy(timestamps).float(), N


def _timestamp_pipeline(model, flat: jnp.ndarray, N: int, encode_fn=None) -> jnp.ndarray:
    """(M, frame_size) device windows (M = BATCH_SIZE multiple, N real rows)
    -> (M, D) per-window embeddings.  One jit per (model, M) pair; mel,
    the reference's 1/N stats quirk (hear/utils.py:37-53, unbiased std),
    normalization and the encoder all run under a single lax.map — one
    dispatch, one host fetch."""
    if encode_fn is None:
        def encode_fn(variables, m):
            from ssl_audio_tpu.eval.encode import encode_lms_units

            units = encode_lms_units(
                lambda xu, _ra: model._unit_apply_impl(variables, xu),
                m, model.model.img_size[1],
            )
            return units.mean(axis=1)

    # fetch_dtype="bfloat16" casts the final embeddings on device so HALF
    # the bytes cross the device->host link (the embeddings dominate the
    # wall clock on remote-attached TPUs: 164 MB fp32 at ~12 MB/s vs 1.2 s
    # of device compute for 64x10s clips, PERF.md).  Off by default — bf16
    # rounds the embeddings to 8 mantissa bits.
    fetch_dtype = getattr(model, "fetch_dtype", "float32")
    cache = getattr(model, "_ts_pipeline_cache", None)
    if cache is None:
        cache = model._ts_pipeline_cache = {}
    key_shape = (flat.shape, N, fetch_dtype)
    fn = cache.get(key_shape)
    if fn is None:

        def pipeline(variables, flat):
            # NOTE: model weights come in as an ARGUMENT — closing over them
            # would bake ~100 MB of constants into the HLO (the remote
            # compiler rejects the oversized program)
            chunks = flat.reshape(-1, BATCH_SIZE, flat.shape[-1])
            mels = jax.lax.map(model.to_feature, chunks)       # (C, B, 1, F, T)
            M = flat.shape[0]
            per_row = int(np.prod(mels.shape[2:]))
            row_ids = jnp.arange(M).reshape(mels.shape[0], BATCH_SIZE)
            rmask = (row_ids < N).astype(jnp.float32)[..., None, None, None]
            total = N * per_row
            s1 = jnp.sum(mels * rmask)
            s2 = jnp.sum(mels * mels * rmask)
            mu = s1 / total
            var = (s2 - total * mu * mu) / (total - 1)         # torch .std()
            mean = mu / N
            std = jnp.sqrt(var) / N

            embs = jax.lax.map(lambda m: encode_fn(variables, (m - mean) / std), mels)
            out = embs.reshape(M, -1)
            if fetch_dtype == "bfloat16":
                out = out.astype(jnp.bfloat16)
            return out

        fn = cache[key_shape] = jax.jit(pipeline)
    return fn(model.variables, flat)


def _fetch_embeddings(emb) -> np.ndarray:
    """Device embeddings -> float32 numpy (bf16-fetched arrays upcast)."""
    host = np.asarray(emb)
    if host.dtype != np.float32:
        host = host.astype(np.float32)
    return host


def get_timestamp_embeddings(
    audio_list: List,
    model: ViTModelWrapper,
    frame_duration: float = TIMESTAMP_FRAME_DUR,
    hop_size: float = TIMESTAMP_HOP_SIZE,
    cfg_path: str = "hear/config.yaml",
) -> Tuple[torch.Tensor, torch.Tensor]:
    """(n_sounds, n_samples) audio -> (n_sounds, n_timestamps, emb) embeddings
    + centered timestamps in ms (reference vit.py:157-226)."""
    audio = _as_numpy(audio_list)
    cfg = model.cfg
    frame_size = int((frame_duration / 1000) * cfg.sample_rate)
    flat, timestamps, N = _frame_audio_on_device(
        audio, frame_size, hop_size, cfg.sample_rate
    )
    n_sounds = audio.shape[0]
    n_frames = N // n_sounds

    # whole pipeline (mel -> reference-quirk stats -> normalize -> per-unit
    # CLS -> unit mean), chunked with lax.map inside ONE jit: a single
    # dispatch and a single host fetch of the final embeddings
    emb = _fetch_embeddings(_timestamp_pipeline(model, flat, N))
    emb = emb[:N].reshape(n_sounds, n_frames, -1)
    return torch.from_numpy(emb).float(), timestamps


def get_scene_embeddings(
    audio_list: List,
    model: ViTModelWrapper,
) -> torch.Tensor:
    """One embedding per clip: mel -> scene-stats normalize -> per-unit CLS
    -> mean over units (reference vit.py:229-247)."""
    audio = _as_numpy(audio_list)
    emb = np.asarray(model.encode(audio).mean(axis=1))
    return torch.from_numpy(emb).float()
