"""Pallas TPU kernel: fused framing -> windowed-DFT -> power -> mel -> log.

One kernel pass computes log-mel for a tile of frames entirely in VMEM,
INCLUDING the overlapped framing (hop 160 < n_fft 1024 means materialized
frames are a 6.4x HBM blow-up — ~1 GB at the bench batch — that the XLA path
(ops/mel.py) writes and re-reads; here the raw wav row is the only HBM read):

    wav row, viewed as (L/hop, hop) chunks, lives in VMEM once per clip
      --VPU--> F: TILE_T overlapped frames from ceil(n_fft/hop)+1 static
               shifted slices of the chunk view (no gather, no HBM traffic)
      --MXU--> re = F @ C, im = F @ S     (TILE_T, n_freqs_used)
      --VPU--> p  = re^2 + im^2
      --MXU--> mel = p @ FB               (TILE_T, n_mels)
      --VPU--> out = log(mel + eps)

Precision: HIGHEST (multi-pass fp32 — required for the <=1e-4 parity
contract; single-pass bf16 costs ~1e-1 relative error from cancellation in
high-frequency bins) or fast=True -> HIGH (3-pass bf16, 1.5e-4 max log-mel
error), mirroring ops/mel.py's modes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl_audio_tpu.ops.mel import TORCH_FLOAT32_EPS, MelSpec

TILE_T = 256  # frames per kernel instance


def _make_kernel(spec: MelSpec, n_shift: int, fast: bool):
    n_fft = spec.n_fft
    prec = jax.lax.Precision.HIGH if fast else jax.lax.Precision.HIGHEST

    def kernel(rows_ref, c_ref, s_ref, fb_ref, out_ref):
        i = pl.program_id(1)
        # rows_ref: (1, L_rows, hop) — the clip's padded wav as hop-sized
        # chunks, resident in VMEM for all i of this clip (constant block).
        w = rows_ref[0, pl.ds(i * TILE_T, TILE_T + n_shift - 1), :]
        # overlapped frames from static shifted slices: frame j = chunks
        # j..j+n_shift-1 flattened, truncated to n_fft samples
        f = jnp.concatenate(
            [w[k : k + TILE_T] for k in range(n_shift)], axis=1
        )[:, :n_fft]
        re = jnp.dot(f, c_ref[:], precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(f, s_ref[:], precision=prec,
                     preferred_element_type=jnp.float32)
        p = re * re + im * im
        mel = jnp.dot(p, fb_ref[:], precision=prec,
                      preferred_element_type=jnp.float32)
        out_ref[0] = jnp.log(mel + TORCH_FLOAT32_EPS)

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 2))
def log_mel_spectrogram_pallas(
    wav: jnp.ndarray, spec: MelSpec, fast: bool = False
) -> jnp.ndarray:
    """(B, L) -> (B, n_mels, T) log-mel via the fused Pallas kernel.
    Matches ops/mel.py log_mel_spectrogram (torch.stft center/reflect
    semantics)."""
    B, L = wav.shape
    hop, n_fft, n_mels = spec.hop_length, spec.n_fft, spec.n_mels
    n_freqs = spec.n_freqs_used
    T = spec.num_frames(L)
    n_shift = -(-n_fft // hop) + 1                  # chunks spanning a frame
    T_pad = ((T + TILE_T - 1) // TILE_T) * TILE_T
    n_rows = T_pad + n_shift - 1

    # torch.stft center pad, then zero-fill to the chunk grid
    x = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, n_rows * hop - x.shape[1])))
    rows = x.reshape(B, n_rows, hop)

    C, S = spec.dft_matrices_mel
    FB = spec.filterbank_mel
    flops = 2 * T_pad * n_fft * n_freqs * 2 + 2 * T_pad * n_freqs * n_mels

    out = pl.pallas_call(
        _make_kernel(spec, n_shift, fast),
        grid=(B, T_pad // TILE_T),
        in_specs=[
            pl.BlockSpec((1, n_rows, hop), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_mels), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, n_mels), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops * B,
            bytes_accessed=B * (n_rows * hop + T_pad * n_mels) * 4,
            transcendentals=B * T_pad * n_mels,
        ),
        interpret=jax.default_backend() != "tpu",
    )(rows, jnp.asarray(C), jnp.asarray(S), jnp.asarray(FB))
    return jnp.swapaxes(out[:, :T], -1, -2)
