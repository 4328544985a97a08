"""Pallas TPU kernel: fused framing -> windowed-DFT -> power -> mel -> log.

One kernel pass computes log-mel for a tile of frames entirely in VMEM,
INCLUDING the overlapped framing (hop 160 < n_fft 1024 means materialized
frames are a 6.4x HBM blow-up — ~1 GB at the bench batch — that the XLA path
(ops/mel.py) writes and re-reads; here the raw wav row is the only HBM read).

The overlapped frames are never built: the DFT matmul is decomposed over
hop-sized chunks of the wav row (frame j = chunks j..j+n_shift-1), so

    re[j] = sum_k rows[j+k] @ C_k,   C_k = C[k*hop:(k+1)*hop]  (zero-padded)

— n_shift small matmuls accumulating in fp32, all operands VMEM-resident.
Mosaic lowering constraints shaped this design: dynamic sublane starts must
be provably 8-aligned (one aligned load per tile, k-shifts via in-register
sublane rotates), and lane-misaligned concatenates are unsupported (hence
chunk matmuls instead of materializing frames).

Precision:
  * default  — fp32 operands at HIGHEST (multi-pass): the <=1e-4 parity
    contract (single-pass bf16 costs ~1e-1 relative error from cancellation
    in high-frequency bins).
  * fast=True — Mosaic does not lower Precision.HIGH, so the bf16x3 scheme
    is hand-rolled: weights are pre-split into bf16 (hi, lo) parts, the wav
    chunk is split in-kernel, and re/im accumulate hi@hi + hi@lo + lo@hi in
    fp32 (the same 3-pass decomposition XLA's HIGH uses, ~1.5e-4 max log-mel
    error).  The tiny power->mel matmul stays fp32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl_audio_tpu.ops.mel import TORCH_FLOAT32_EPS, MelSpec

import os as _os

TILE_T = int(_os.environ.get("PALLAS_MEL_TILE", "256"))  # frames per instance


def _chunked_dft_matrices(spec: MelSpec):
    """(n_shift, hop, n_freqs_used) zero-padded chunk views of C and S:
    chunk k holds DFT rows [k*hop, (k+1)*hop) (rows >= n_fft are zero, so
    the chunk matmuls never need column-sliced wav blocks)."""
    C, S = spec.dft_matrices_mel                       # (n_fft, n_freqs_used)
    hop = spec.hop_length
    n_shift = -(-spec.n_fft // hop) + 1
    padded = n_shift * hop
    Cp = np.zeros((padded, C.shape[1]), np.float32)
    Sp = np.zeros((padded, S.shape[1]), np.float32)
    Cp[: spec.n_fft] = C
    Sp[: spec.n_fft] = S
    return (Cp.reshape(n_shift, hop, -1), Sp.reshape(n_shift, hop, -1),
            n_shift)


def _split_bf16(x: np.ndarray):
    """x ~= hi + lo with both parts exactly representable in bfloat16."""
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    lo = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _shifted(w_all, k):
    """rows j+k of the aligned window (sublane rotate + static slice;
    roll-by-0 would lower to a zero-size slice)."""
    return w_all[:TILE_T] if k == 0 else jnp.roll(w_all, -k, axis=0)[:TILE_T]


def _make_kernel(n_shift: int, n_freqs: int, fast: bool):
    # sublane-aligned window: TILE_T + n_shift rounded up to a multiple of 8
    w_rows = TILE_T + ((n_shift + 7) // 8) * 8
    f32 = jnp.float32

    if not fast:
        prec = jax.lax.Precision.HIGHEST

        def kernel(rows_ref, c_ref, s_ref, fb_ref, out_ref):
            i = pl.program_id(1)
            w_all = rows_ref[0, pl.ds(i * TILE_T, w_rows), :]
            re = jnp.zeros((TILE_T, n_freqs), f32)
            im = jnp.zeros((TILE_T, n_freqs), f32)
            for k in range(n_shift):
                wk = _shifted(w_all, k)
                re += jnp.dot(wk, c_ref[k], precision=prec,
                              preferred_element_type=f32)
                im += jnp.dot(wk, s_ref[k], precision=prec,
                              preferred_element_type=f32)
            p = re * re + im * im
            mel = jnp.dot(p, fb_ref[:], precision=prec,
                          preferred_element_type=f32)
            out_ref[0] = jnp.log(mel + TORCH_FLOAT32_EPS)

        return kernel, w_rows

    def kernel(rows_ref, c_hi_ref, c_lo_ref, s_hi_ref, s_lo_ref, fb_ref,
               out_ref):
        i = pl.program_id(1)
        w_all = rows_ref[0, pl.ds(i * TILE_T, w_rows), :]
        w_hi_all = w_all.astype(jnp.bfloat16)
        w_lo_all = (w_all - w_hi_all.astype(f32)).astype(jnp.bfloat16)
        re = jnp.zeros((TILE_T, n_freqs), f32)
        im = jnp.zeros((TILE_T, n_freqs), f32)
        for k in range(n_shift):
            w_hi = _shifted(w_hi_all, k)
            w_lo = _shifted(w_lo_all, k)
            for b_hi, b_lo, acc in ((c_hi_ref, c_lo_ref, "re"),
                                    (s_hi_ref, s_lo_ref, "im")):
                v = (jnp.dot(w_hi, b_hi[k], preferred_element_type=f32)
                     + jnp.dot(w_hi, b_lo[k], preferred_element_type=f32)
                     + jnp.dot(w_lo, b_hi[k], preferred_element_type=f32))
                if acc == "re":
                    re += v
                else:
                    im += v
        p = re * re + im * im
        mel = jnp.dot(p, fb_ref[:], precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=f32)
        out_ref[0] = jnp.log(mel + TORCH_FLOAT32_EPS)

    return kernel, w_rows


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
    Cp, Sp, n_shift = _chunked_dft_matrices(spec)
    kernel, w_rows = _make_kernel(n_shift, n_freqs, fast)
    T_pad = ((T + TILE_T - 1) // TILE_T) * TILE_T
    n_rows = T_pad - TILE_T + w_rows        # last tile's window must fit

    # torch.stft center pad, then zero-fill to the chunk grid
    x = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, n_rows * hop - x.shape[1])))
    rows = x.reshape(B, n_rows, hop)

    FB = spec.filterbank_mel
    flops = 2 * T_pad * (n_shift * hop) * n_freqs * 2 + 2 * T_pad * n_freqs * n_mels

    def wspec(dtype_bytes=4):
        return pl.BlockSpec((n_shift, hop, n_freqs), lambda b, i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    if fast:
        c_hi, c_lo = _split_bf16(Cp)
        s_hi, s_lo = _split_bf16(Sp)
        weights = [jnp.asarray(w) for w in (c_hi, c_lo, s_hi, s_lo)]
        weight_specs = [wspec(2) for _ in range(4)]
    else:
        weights = [jnp.asarray(Cp), jnp.asarray(Sp)]
        weight_specs = [wspec(), wspec()]

    out = pl.pallas_call(
        kernel,
        grid=(B, T_pad // TILE_T),
        in_specs=[
            pl.BlockSpec((1, n_rows, hop), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
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
    )(rows, *weights, jnp.asarray(FB))
    return jnp.swapaxes(out[:, :T], -1, -2)
