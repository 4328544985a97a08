"""Pallas TPU kernel: fused windowed-DFT -> power -> mel -> log.

One kernel pass computes log-mel for a tile of frames entirely in VMEM:

    frames tile (T_m, 1024)
      --MXU--> re = frames @ C        (T_m, 513)   } fp32 accumulation
      --MXU--> im = frames @ S        (T_m, 513)   }
      --VPU--> p  = re^2 + im^2
      --MXU--> mel = p @ FB           (T_m, 64)
      --VPU--> out = log(mel + eps)

vs the XLA path (ops/mel.py) the re/im/power intermediates — 3 x (B*T, 513)
fp32 arrays, ~0.5 GB at the bench batch — never touch HBM.  The DFT matmuls
run at HIGHEST precision (multi-pass fp32 on the MXU): required for the
<=1e-4 parity contract (bf16 single-pass costs ~1e-1 relative error from
cancellation in high-frequency bins).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl_audio_tpu.ops.mel import TORCH_FLOAT32_EPS, MelSpec, frame_signal

TILE_M = 256  # frames per kernel instance


def _logmel_kernel(frames_ref, c_ref, s_ref, fb_ref, out_ref):
    fr = frames_ref[:]
    prec = jax.lax.Precision.HIGHEST
    re = jnp.dot(fr, c_ref[:], precision=prec, preferred_element_type=jnp.float32)
    im = jnp.dot(fr, s_ref[:], precision=prec, preferred_element_type=jnp.float32)
    p = re * re + im * im
    mel = jnp.dot(p, fb_ref[:], precision=prec, preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + TORCH_FLOAT32_EPS)


@functools.partial(jax.jit, static_argnums=1)
def log_mel_frames_pallas(frames: jnp.ndarray, spec: MelSpec) -> jnp.ndarray:
    """(M, n_fft) frames -> (M, n_mels) log-mel rows via the fused kernel.
    M is padded to a TILE_M multiple internally."""
    M = frames.shape[0]
    n_fft, n_freqs, n_mels = spec.n_fft, spec.n_freqs_used, spec.n_mels
    M_pad = ((M + TILE_M - 1) // TILE_M) * TILE_M
    if M_pad != M:
        frames = jnp.pad(frames, ((0, M_pad - M), (0, 0)))
    C, S = spec.dft_matrices_mel
    FB = spec.filterbank_mel

    flops_tile = 2 * TILE_M * n_fft * n_freqs * 2 + 2 * TILE_M * n_freqs * n_mels
    out = pl.pallas_call(
        _logmel_kernel,
        grid=(M_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * (M_pad // TILE_M),
            bytes_accessed=M_pad * (n_fft + n_mels) * 4,
            transcendentals=M_pad * n_mels,
        ),
    )(frames, jnp.asarray(C), jnp.asarray(S), jnp.asarray(FB))
    return out[:M]


@functools.partial(jax.jit, static_argnums=1)
def log_mel_spectrogram_pallas(wav: jnp.ndarray, spec: MelSpec) -> jnp.ndarray:
    """(B, L) -> (B, n_mels, T): framing via XLA gather, transform via the
    fused Pallas kernel."""
    B = wav.shape[0]
    frames = frame_signal(wav, spec)                       # (B, T, n_fft)
    T = frames.shape[1]
    rows = log_mel_frames_pallas(frames.reshape(B * T, spec.n_fft), spec)
    return jnp.swapaxes(rows.reshape(B, T, spec.n_mels), -1, -2)
