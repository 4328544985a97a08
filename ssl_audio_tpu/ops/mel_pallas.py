"""Pallas TPU kernel: fused framing -> windowed-DFT -> power -> mel -> log.

One kernel pass computes log-mel for a tile of frames entirely in VMEM,
INCLUDING the overlapped framing (hop 160 < n_fft 1024 means materialized
frames are a 6.4x HBM blow-up — ~1 GB at the bench batch — that the XLA path
(ops/mel.py) writes and re-reads; here the raw wav row is the only HBM read).

The overlapped frames are never built: the DFT matmul is decomposed over
hop-sized chunks of the wav row (frame j = chunks j..j+n_shift-1), so

    v[j] = sum_k rows[j+k] @ CS_k,   CS_k = [C | S][k*hop:(k+1)*hop]

— n_shift small matmuls accumulating in fp32, all operands VMEM-resident.
The cos and sin bases are MERGED into one (hop, 2*n_freqs) matrix per chunk
(re = v[:, :n_freqs], im = v[:, n_freqs:], both lane-aligned slices since
n_freqs_used is a 128 multiple): half the dot dispatches of separate re/im
accumulators at identical FLOPs, and one shared fp32 accumulator.  Mosaic
lowering constraints shaped the rest: dynamic sublane starts must be provably
8-aligned (one aligned load per tile, k-shifts via in-register sublane
rotates), and lane-misaligned concatenates are unsupported (hence chunk
matmuls instead of materializing frames).

Precision modes (Mosaic does not lower Precision.HIGH, and its HIGHEST
lowering of fp32 dots loses to hand-rolled bf16 splits — all multi-pass
schemes here are hand-rolled: weights pre-split host-side into exact bf16
parts w = w0 + w1 (+ w2), the wav chunk split in-kernel the same way, and
selected part-products accumulated in fp32):

  * mode="f32" (default) — fp32 operands at HIGHEST via Mosaic's own
    multi-pass lowering; 8.1e-6 max log-mel error vs float64.
  * mode="fast" (fast=True) — 3 passes (00+01+10), the same decomposition
    XLA's Precision.HIGH uses; ~1.5e-4 max log-mel error.
  * mode="precise" — 6 passes over 3-part splits (00+01+10+11+02+20),
    the decomposition XLA's HIGHEST uses for fp32 on TPU: the dropped terms
    are O(2^-32) relative, giving f32-quality results (~1e-5) at bf16 MXU
    rates.  This is the hand-rolled fp32 multi-pass (VERDICT r2 #9).

The tiny power->mel matmul stays fp32 HIGHEST in every mode.

Folded variant (r4): when the window is midpoint-symmetric with w[0] == 0
(periodic Hann — the reference's torch.stft default, datasets.py:39-48), the
DFT reduces to half-size GEMMs over folded frames e = f + f_rev, o = f - f_rev
(see MelSpec.dft_matrices_folded) — HALF the MXU passes, which is this
kernel's measured cost axis (PERF.md: 3-pass 22.7 ms / 6-pass 39.3 ms, linear
in passes).  The reversed reads never leave the sublane-shift access pattern:
a second row tensor holds the flipped signal laid out so frame j's k-th
reversed chunk is rows[j + kf-1-k] — the same aligned-slab + in-register
rotate the forward stream uses (Mosaic forbids lane-misaligned slices, so an
in-kernel lane reversal is not an option).  Exactness of the streaming fold:
lane c of reversed chunk 0 reads x[s + n_fft - c], whose c = 0 element is the
sample one PAST the frame (the fold formula wants f[(N-n) % N], i.e. f[0] at
n = 0) — but row 0 of the folded bases carries w[0] == 0, so that column is
multiplied by an exactly-zero weight (asserted at build time).  Windows with
w[0] != 0 (or asymmetric) fall back to the unfolded kernel automatically.
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

# part-product passes per mode: (wav_part, weight_part) pairs, over exact
# bf16 splits x = x0 + x1 (+ x2) with |x_i| <= 2^-8 |x_{i-1}|
MODE_PASSES = {
    "f32": [(0, 0)],
    "fast": [(0, 0), (0, 1), (1, 0)],
    "precise": [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0)],
}


def _chunked_cs_matrix(spec: MelSpec):
    """(n_shift, hop, 2*n_freqs_used) zero-padded chunk views of [C | S]:
    chunk k holds DFT rows [k*hop, (k+1)*hop) (rows >= n_fft are zero, so
    the chunk matmuls never need column-sliced wav blocks)."""
    C, S = spec.dft_matrices_mel                       # (n_fft, n_freqs_used)
    CS = np.concatenate([C, S], axis=1)
    hop = spec.hop_length
    n_shift = -(-spec.n_fft // hop) + 1
    padded = n_shift * hop
    P = np.zeros((padded, CS.shape[1]), np.float32)
    P[: spec.n_fft] = CS
    return P.reshape(n_shift, hop, -1), n_shift


def _chunked_cs_matrix_folded(spec: MelSpec):
    """(2, kf, hop, n_freqs_used) zero-padded chunk views of the FOLDED
    bases (index 0 = C_half for the even stream e, 1 = S_half for the odd
    stream o), or None when the fold does not apply (asymmetric window or
    w[0] != 0 — the streaming fold's n = 0 column reads x[s + n_fft], which
    is only exact because row 0 of the bases is zero)."""
    folded = spec.dft_matrices_mel_folded
    if folded is None or spec.window[0] != 0.0:
        return None
    C_half, S_half = folded                     # (n_fft//2+1, n_freqs_used)
    hop = spec.hop_length
    h = spec.n_fft // 2 + 1
    kf = -(-h // hop)
    P = np.zeros((2, kf * hop, C_half.shape[1]), np.float32)
    P[0, :h] = C_half
    P[1, :h] = S_half
    if P[:, 0].any():
        # hard check (not an assert — must survive `python -O`): a nonzero
        # n = 0 basis row would make the wrap column read x[s + n_fft]
        # incorrectly; fall back to the unfolded kernel (ADVICE r4)
        return None
    return P.reshape(2, kf, hop, -1), kf


def _split_bf16(x: np.ndarray, parts: int):
    """x == sum of `parts` bfloat16 arrays (each part exactly representable;
    the residual after `parts` parts is dropped — O(2^-8·parts) relative)."""
    import ml_dtypes

    out = []
    r = x.astype(np.float32)
    for _ in range(parts):
        h = r.astype(ml_dtypes.bfloat16)
        out.append(h)
        r = r - h.astype(np.float32)
    return out


def _shifted(w_all, k):
    """rows j+k of the aligned window (sublane rotate + static slice;
    roll-by-0 would lower to a zero-size slice)."""
    return w_all[:TILE_T] if k == 0 else jnp.roll(w_all, -k, axis=0)[:TILE_T]


def _make_kernel(n_shift: int, n_freqs: int, mode: str):
    # sublane-aligned window: TILE_T + n_shift rounded up to a multiple of 8
    w_rows = TILE_T + ((n_shift + 7) // 8) * 8
    f32 = jnp.float32
    passes = MODE_PASSES[mode]
    n_wav_parts = 1 + max(a for a, _ in passes) if mode != "f32" else 1
    n_w_parts = 1 + max(b for _, b in passes) if mode != "f32" else 1

    def kernel(rows_ref, *refs):
        cs_refs = refs[:n_w_parts]
        fb_ref = refs[n_w_parts]
        out_ref = refs[n_w_parts + 1]
        i = pl.program_id(1)
        w_all = rows_ref[0, pl.ds(i * TILE_T, w_rows), :]
        if mode == "f32":
            wav_parts = [w_all]
        else:
            wav_parts = []
            r = w_all
            for _ in range(n_wav_parts):
                h = r.astype(jnp.bfloat16)
                wav_parts.append(h)
                r = r - h.astype(f32)
        v = jnp.zeros((TILE_T, 2 * n_freqs), f32)
        for k in range(n_shift):
            shifted = {}
            for a, b in passes:
                if a not in shifted:
                    shifted[a] = _shifted(wav_parts[a], k)
                if mode == "f32":
                    v += jnp.dot(shifted[a], cs_refs[b][k],
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=f32)
                else:
                    v += jnp.dot(shifted[a], cs_refs[b][k],
                                 preferred_element_type=f32)
        re = v[:, :n_freqs]
        im = v[:, n_freqs:]
        p = re * re + im * im
        mel = jnp.dot(p, fb_ref[:], precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=f32)
        out_ref[0] = jnp.log(mel + TORCH_FLOAT32_EPS)

    return kernel, w_rows, n_w_parts


def _make_kernel_folded(kf: int, n_freqs: int, mode: str):
    """Folded-stream kernel: per chunk k, e/o are built from the forward and
    reversed row slabs (both plain sublane shifts) and feed two half-width
    dots (e @ C_half_k, o @ S_half_k) — half the MXU passes of the unfolded
    kernel's full-width [C | S] dot at every precision mode."""
    w_rows = TILE_T + ((kf + 7) // 8) * 8
    f32 = jnp.float32
    passes = MODE_PASSES[mode]
    n_in_parts = 1 + max(a for a, _ in passes) if mode != "f32" else 1
    n_w_parts = 1 + max(b for _, b in passes) if mode != "f32" else 1

    def kernel(rows_ref, rrows_ref, *refs):
        cs_refs = refs[:n_w_parts]              # each (2, kf, hop, n_freqs)
        fb_ref = refs[n_w_parts]
        out_ref = refs[n_w_parts + 1]
        i = pl.program_id(1)
        wf = rows_ref[0, pl.ds(i * TILE_T, w_rows), :]
        wr = rrows_ref[0, pl.ds(i * TILE_T, w_rows), :]
        vre = jnp.zeros((TILE_T, n_freqs), f32)
        vim = jnp.zeros((TILE_T, n_freqs), f32)
        for k in range(kf):
            fwd = _shifted(wf, k)
            rev = _shifted(wr, kf - 1 - k)
            e = fwd + rev
            o = fwd - rev
            if mode == "f32":
                e_parts, o_parts = [e], [o]
            else:
                e_parts, o_parts = [], []
                re_, ro_ = e, o
                for _ in range(n_in_parts):
                    he = re_.astype(jnp.bfloat16)
                    ho = ro_.astype(jnp.bfloat16)
                    e_parts.append(he)
                    o_parts.append(ho)
                    re_ = re_ - he.astype(f32)
                    ro_ = ro_ - ho.astype(f32)
            for a, b in passes:
                if mode == "f32":
                    vre += jnp.dot(e_parts[a], cs_refs[b][0, k],
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=f32)
                    vim += jnp.dot(o_parts[a], cs_refs[b][1, k],
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=f32)
                else:
                    vre += jnp.dot(e_parts[a], cs_refs[b][0, k],
                                   preferred_element_type=f32)
                    vim += jnp.dot(o_parts[a], cs_refs[b][1, k],
                                   preferred_element_type=f32)
        p = vre * vre + vim * vim
        mel = jnp.dot(p, fb_ref[:], precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=f32)
        out_ref[0] = jnp.log(mel + TORCH_FLOAT32_EPS)

    return kernel, w_rows, n_w_parts


def _reversed_rows(x: jnp.ndarray, spec: MelSpec, n_rows: int) -> jnp.ndarray:
    """(B, n_rows*hop) zero-filled padded signal -> (B, n_rows, hop) reversed
    row tensor for the folded kernel: row r, lane c holds
    x[D + r*hop - c] with D = n_fft - (kf-1)*hop, so frame j's k-th reversed
    chunk (lane c = sample x[j*hop + n_fft - (k*hop + c)]) is exactly row
    j + kf-1-k — the same sublane-shift slab access as the forward stream."""
    hop = spec.hop_length
    h = spec.n_fft // 2 + 1
    kf = -(-h // hop)
    D = spec.n_fft - (kf - 1) * hop
    start = D - hop + 1
    stop = D + (n_rows - 1) * hop + 1
    pad_l = max(0, -start)
    pad_r = max(0, stop - x.shape[-1])
    xe = jnp.pad(x, ((0, 0), (pad_l, pad_r)))
    seg = xe[:, start + pad_l: stop + pad_l]              # (B, n_rows*hop)
    z = jnp.flip(seg, axis=-1).reshape(x.shape[0], n_rows, hop)
    return jnp.flip(z, axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def log_mel_spectrogram_pallas(
    wav: jnp.ndarray, spec: MelSpec, fast: bool = False,
    mode: str | None = None, fold: bool | None = None,
) -> jnp.ndarray:
    """(B, L) -> (B, n_mels, T) log-mel via the fused Pallas kernel.
    Matches ops/mel.py log_mel_spectrogram (torch.stft center/reflect
    semantics).  mode in {"f32", "fast", "precise"} overrides the legacy
    fast flag (see module docstring).  fold: None = auto (folded kernel
    whenever the window admits it — half the MXU passes), True = require
    it, False = force the unfolded kernel (A/B benchmarking)."""
    if mode is None:
        mode = "fast" if fast else "f32"
    if mode not in MODE_PASSES:
        raise ValueError(f"unknown mel kernel mode {mode!r}")
    B, L = wav.shape
    hop, n_fft, n_mels = spec.hop_length, spec.n_fft, spec.n_mels
    n_freqs = spec.n_freqs_used
    T = spec.num_frames(L)
    folded = _chunked_cs_matrix_folded(spec) if fold is not False else None
    if fold and folded is None:
        raise ValueError("fold=True but the window is not foldable")
    if folded is not None:
        CSp, n_chunks = folded
        kernel, w_rows, n_w_parts = _make_kernel_folded(n_chunks, n_freqs, mode)
    else:
        CSp, n_chunks = _chunked_cs_matrix(spec)
        kernel, w_rows, n_w_parts = _make_kernel(n_chunks, n_freqs, mode)
    T_pad = ((T + TILE_T - 1) // TILE_T) * TILE_T
    n_rows = T_pad - TILE_T + w_rows        # last tile's window must fit

    # torch.stft center pad, then zero-fill to the chunk grid
    x = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, n_rows * hop - x.shape[1])))
    rows = x.reshape(B, n_rows, hop)

    FB = spec.filterbank_mel
    n_passes = len(MODE_PASSES[mode])
    # per frame: n_chunks dots with 2*n_freqs total output lanes (one merged
    # [C|S] dot unfolded; two half-width e/o dots folded) — the fold's 2x is
    # n_chunks (kf = ceil((n_fft/2+1)/hop) vs ceil(n_fft/hop)+1)
    flops = (2 * T_pad * (n_chunks * hop) * (2 * n_freqs) * n_passes
             + 2 * T_pad * n_freqs * n_mels)

    def wspec():
        shape = CSp.shape
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    if mode == "f32":
        weights = [jnp.asarray(CSp)]
    else:
        weights = [jnp.asarray(w) for w in _split_bf16(CSp, n_w_parts)]
    weight_specs = [wspec() for _ in weights]

    rowspec = pl.BlockSpec((1, n_rows, hop), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    inputs = [rows]
    in_specs = [rowspec]
    if folded is not None:
        inputs.append(_reversed_rows(x, spec, n_rows))
        in_specs.append(rowspec)

    out = pl.pallas_call(
        kernel,
        grid=(B, T_pad // TILE_T),
        in_specs=[
            *in_specs,
            *weight_specs,
            pl.BlockSpec((n_freqs, n_mels), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, n_mels), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops * B,
            bytes_accessed=B * (len(inputs) * n_rows * hop
                                + T_pad * n_mels) * 4,
            transcendentals=B * T_pad * n_mels,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs, *weights, jnp.asarray(FB))
    return jnp.swapaxes(out[:, :T], -1, -2)
