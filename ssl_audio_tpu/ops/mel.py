"""GEMM-native log-mel spectrogram frontend.

Reproduces the torchaudio pipeline the reference builds in datasets.py:39-48 /
hear/sample/vit.py:27-38 (MelSpectrogram(sr=16000, n_fft=1024, win_length=1024
[HEAR: 400], hop=160, n_mels=64, f_min=60, f_max=7800, power=2) followed by
log(x + eps)) — but designed for the TPU MXU instead of a C++ STFT:

    wav --reflect-pad--> frames (B, T, n_fft)
        --GEMM--> real = frames @ C, imag = frames @ S     (window folded in)
        --VPU --> power = real^2 + imag^2
        --GEMM--> mel   = power @ FB                        (513 x n_mels)
        --VPU --> log(mel + eps)

Everything is a large batched matmul + fused elementwise, which XLA maps onto
the MXU; there is no FFT butterfly and no dynamic shape anywhere.  For
n_fft=1024 the DFT-as-GEMM costs 2*1024*513 MACs/frame vs ~ 1024*10 for an FFT,
but at 64-mel/96-frame scale the op is tiny and entirely compute-bound on the
MXU, which is exactly where a TPU wants it (see PAPERS.md "MelT: GEMM-Native
NDFT").

Numerical contract (tested in tests/test_mel.py): matches
torch.stft(center=True, pad_mode='reflect', onesided=True,
window=hann(periodic)) |.|^2 followed by torchaudio's HTK mel filterbank
(norm=None) to <= 1e-4.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# torch.finfo(torch.float32).eps — the log epsilon the reference adds
# (datasets.py:115: (mel + torch.finfo().eps).log())
TORCH_FLOAT32_EPS = float(np.finfo(np.float32).eps)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: str | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, (n_freqs, n_mels), float32.

    Same construction as torchaudio.functional.melscale_fbanks with
    mel_scale='htk' (the torchaudio default the reference relies on):
    mel points linspace'd in HTK-mel space, triangles formed from the
    difference of slopes, no area normalization when norm is None.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs, dtype=np.float64)
    m_min, m_max = hz_to_mel_htk(f_min), hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)                                   # (n_mels+2,)
    f_diff = f_pts[1:] - f_pts[:-1]                                # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]                   # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


@dataclass(frozen=True)
class MelSpec:
    """Static spec + precomputed constant matrices for the frontend."""

    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 160
    n_mels: int = 64
    f_min: float = 60.0
    f_max: float = 7800.0
    power: float = 2.0

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @functools.cached_property
    def window(self) -> np.ndarray:
        """Window padded to n_fft the way torch.stft does (centered)."""
        w = hann_window(self.win_length)
        if self.win_length < self.n_fft:
            left = (self.n_fft - self.win_length) // 2
            w = np.pad(w, (left, self.n_fft - self.win_length - left))
        return w

    @functools.cached_property
    def dft_matrices(self) -> tuple[np.ndarray, np.ndarray]:
        """(C, S): (n_fft, n_freqs) windowed real-DFT bases.

        real[k] = sum_n w[n] x[n] cos(2 pi n k / N)
        imag[k] = -sum_n w[n] x[n] sin(2 pi n k / N)
        The sign of imag is irrelevant for |.|^2 so S carries +sin.
        """
        n = np.arange(self.n_fft, dtype=np.float64)[:, None]
        k = np.arange(self.n_freqs, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * n * k / self.n_fft
        w = self.window.astype(np.float64)[:, None]
        C = (w * np.cos(ang)).astype(np.float32)
        S = (w * np.sin(ang)).astype(np.float32)
        return C, S

    @functools.cached_property
    def dft_matrices_folded(self) -> tuple[np.ndarray, np.ndarray] | None:
        """(C_half, S_half): (n_fft//2+1, n_freqs) bases for the even/odd
        FOLDED frame representation — the TPU-native halving of the DFT GEMM.

        The windowed cos basis is symmetric about the frame midpoint and the
        sin basis antisymmetric (periodic Hann: w[n] == w[N-n]):

            re[k] = sum_n f[n] C[n,k] = sum_{n<=N/2} e[n] C_half[n,k]
            im[k] = sum_n f[n] S[n,k] = sum_{n<=N/2} o[n] S_half[n,k]

        with e[n] = f[n] + f[(N-n) % N],  o[n] = f[n] - f[(N-n) % N]
        (so e[0] = 2 f[0], e[N/2] = 2 f[N/2] -> rows 0 and N/2 of C are
        halved — exact in fp).  Same sums, reassociated pairwise: HALF the
        MXU passes at every precision, which is the whole cost of the
        fp32-HIGHEST (6-pass) slot.  Returns None when the window is not
        midpoint-symmetric (then callers use the unfolded bases)."""
        if self.n_fft % 2:
            return None
        w = self.window.astype(np.float64)
        idx = (self.n_fft - np.arange(self.n_fft)) % self.n_fft
        if not np.allclose(w, w[idx], rtol=0, atol=0):
            return None
        C, S = self.dft_matrices
        h = self.n_fft // 2 + 1
        C_half = C[:h].copy()
        C_half[0] *= 0.5
        C_half[self.n_fft // 2] *= 0.5
        return C_half, S[:h].copy()

    @functools.cached_property
    def dft_matrices_mel_folded(self) -> tuple[np.ndarray, np.ndarray] | None:
        """Folded bases truncated to n_freqs_used columns (mel outputs)."""
        folded = self.dft_matrices_folded
        if folded is None:
            return None
        C_half, S_half = folded
        k = self.n_freqs_used
        return C_half[:, :k], S_half[:, :k]

    @functools.cached_property
    def filterbank(self) -> np.ndarray:
        return mel_filterbank(
            self.n_freqs, self.f_min, self.f_max, self.n_mels, self.sample_rate
        )

    @functools.cached_property
    def n_freqs_used(self) -> int:
        """Frequency bins that can contribute to any mel band, rounded up to
        a 128 lane multiple.  Bins above f_max have all-zero filterbank rows
        (f_max 7800 < Nyquist -> rows 500..512 are zero for the defaults), so
        truncating the DFT there is mathematically exact and removes both the
        dead bins and the 513 -> 640 MXU lane padding."""
        nz = np.nonzero(self.filterbank.sum(axis=1))[0]
        last = int(nz.max()) + 1 if len(nz) else self.n_freqs
        return min(self.n_freqs, ((last + 127) // 128) * 128)

    @functools.cached_property
    def dft_matrices_mel(self) -> tuple[np.ndarray, np.ndarray]:
        """(C, S) truncated to n_freqs_used columns — for mel outputs only
        (power_spectrogram keeps the full one-sided spectrum)."""
        C, S = self.dft_matrices
        k = self.n_freqs_used
        return C[:, :k], S[:, :k]

    @functools.cached_property
    def filterbank_mel(self) -> np.ndarray:
        return self.filterbank[: self.n_freqs_used]

    @functools.cached_property
    def power_to_mel(self) -> np.ndarray:
        """Alias of filterbank, (n_freqs, n_mels)."""
        return self.filterbank

    def num_frames(self, num_samples: int) -> int:
        # torch.stft(center=True): 1 + L // hop
        return 1 + num_samples // self.hop_length

    @classmethod
    def from_config(cls, cfg) -> "MelSpec":
        return cls(
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            win_length=cfg.win_length,
            hop_length=cfg.hop_length,
            n_mels=cfg.n_mels,
            f_min=float(cfg.f_min),
            f_max=float(cfg.f_max),
        )


def frame_signal(wav: jnp.ndarray, spec: MelSpec) -> jnp.ndarray:
    """(..., L) -> (..., T, n_fft) frames with torch.stft center/reflect pad."""
    pad = spec.n_fft // 2
    pad_widths = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
    x = jnp.pad(wav, pad_widths, mode="reflect")
    T = spec.num_frames(wav.shape[-1])
    # gather frame windows via a strided index grid (static shapes)
    starts = np.arange(T) * spec.hop_length
    idx = starts[:, None] + np.arange(spec.n_fft)[None, :]        # (T, n_fft)
    return x[..., idx]


def _fold_frames(x: jnp.ndarray, spec: MelSpec,
                 starts: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., L_padded) -> (e, o) folded frames, each (..., T, n_fft//2+1),
    gathered straight from the padded signal — the (..., T, n_fft) frames
    tensor (a 6.4x HBM blow-up at hop 160) never exists.  e/o feed the
    folded half-size DFT bases (see MelSpec.dft_matrices_folded)."""
    h = spec.n_fft // 2 + 1
    n = np.arange(h)
    idx_f = starts[:, None] + n[None, :]                          # (T, h)
    idx_m = starts[:, None] + (spec.n_fft - n) % spec.n_fft
    a = x[..., idx_f]
    b = x[..., idx_m]
    return a + b, a - b


# The DFT-as-GEMM must accumulate in fp32 on the MXU: at the TPU default
# (single-pass bf16) the cancellation in high-frequency bins costs ~1e-1
# relative error; at HIGHEST (multi-pass fp32) it is ~4e-6 (measured on v5e).
# HIGH (3-pass bf16) measured 1.5e-4 max log-mel error at ~1.4x the speed —
# exposed as fast=True for contracts that tolerate it (offline conversion,
# feature extraction), PERF.md "known inefficiencies".
_PREC = jax.lax.Precision.HIGHEST
_PREC_FAST = jax.lax.Precision.HIGH


def _prec(fast: bool):
    return _PREC_FAST if fast else _PREC


def _dft_power(wav: jnp.ndarray, spec: MelSpec, fast: bool,
               mel_cols: bool) -> jnp.ndarray:
    """(..., L) -> (..., T, n_freqs[_used]) |DFT|^2 — folded half-size GEMMs
    when the window is midpoint-symmetric (half the MXU passes; exact same
    sums pairwise-reassociated), full-frame GEMMs otherwise."""
    p = _prec(fast)
    folded = spec.dft_matrices_mel_folded if mel_cols else spec.dft_matrices_folded
    if folded is not None:
        pad = spec.n_fft // 2
        x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)],
                    mode="reflect")
        T = spec.num_frames(wav.shape[-1])
        e, o = _fold_frames(x, spec, np.arange(T) * spec.hop_length)
        C_half, S_half = folded
        re = jnp.matmul(e, jnp.asarray(C_half), precision=p)
        im = jnp.matmul(o, jnp.asarray(S_half), precision=p)
    else:
        frames = frame_signal(wav, spec)                           # (..., T, n_fft)
        C, S = spec.dft_matrices_mel if mel_cols else spec.dft_matrices
        re = jnp.matmul(frames, jnp.asarray(C), precision=p)
        im = jnp.matmul(frames, jnp.asarray(S), precision=p)
    return re * re + im * im


@functools.partial(jax.jit, static_argnums=(1, 2))
def power_spectrogram(wav: jnp.ndarray, spec: MelSpec, fast: bool = False) -> jnp.ndarray:
    """(..., L) -> (..., n_freqs, T) power spectrogram via windowed-DFT GEMMs."""
    power = _dft_power(wav, spec, fast, mel_cols=False)
    return jnp.swapaxes(power, -1, -2)                             # (..., n_freqs, T)


@functools.partial(jax.jit, static_argnums=(1, 2))
def mel_spectrogram(wav: jnp.ndarray, spec: MelSpec, fast: bool = False) -> jnp.ndarray:
    """(..., L) -> (..., n_mels, T) mel power spectrogram."""
    power = _dft_power(wav, spec, fast, mel_cols=True)             # (..., T, n_used)
    mel = jnp.matmul(power, jnp.asarray(spec.filterbank_mel),
                     precision=_prec(fast))
    return jnp.swapaxes(mel, -1, -2)


@functools.partial(jax.jit, static_argnums=(1, 2))
def log_mel_spectrogram(wav: jnp.ndarray, spec: MelSpec, fast: bool = False) -> jnp.ndarray:
    """(..., L) -> (..., n_mels, T) log-mel, the reference's
    (melspec(wav) + torch.finfo().eps).log()."""
    return jnp.log(mel_spectrogram(wav, spec, fast) + TORCH_FLOAT32_EPS)


@functools.partial(jax.jit, static_argnums=(1, 3, 4))
def log_mel_spectrogram_cropped(
    wav: jnp.ndarray, spec: MelSpec, starts: jnp.ndarray, out_frames: int,
    fast: bool = False,
) -> jnp.ndarray:
    """(B, L) + per-clip frame starts -> (B, n_mels, out_frames) log-mel of
    ONLY the cropped window: frame t of the output equals frame starts[b]+t of
    log_mel_spectrogram(wav).  Guarantees the 10x FLOP saving of
    crop-before-transform even when XLA cannot hoist the crop itself (e.g.
    through a gradient graph).

    Stage 1: reflect-pad once (torch.stft centering), then gather ONE
    contiguous (out_frames-1)*hop + n_fft sample segment per clip.  Because
    every crop start is hop-aligned in sample space, the padded signal is
    viewed as (B, n_blocks, hop) and the segment is a take_along_axis row
    gather of ceil(seg_len/hop) hop-sized blocks — XLA lowers it as one
    batched row gather of contiguous lanes (~680 GB/s measured).  The
    per-row vmapped dynamic_slice this replaces lowered to a sequential
    batch loop of slice + update-slice at 65-99 GB/s (0.79 ms of the 14.2 ms
    AudioNTT step, XProf 2026-08-19).  Stage 2: static framing WITHIN the
    segment.  The earlier designs: framing the full signal first
    ((B, T, n_fft) — a 6.4x HBM blow-up) measured 17.7 ms at B=256, and a
    direct data-dependent element gather is ~100x slower than either."""
    pad = spec.n_fft // 2
    seg_len = (out_frames - 1) * spec.hop_length + spec.n_fft
    hop = spec.hop_length
    n_blocks = -(-seg_len // hop)
    # ONE pad pass covers both the stft centering and the block-window
    # overshoot: valid starts end their raw segment at <= L = T + 2*pad, so
    # every sample a rounded-up block window reads past L lands in the tail
    # the [..., :seg_len] slice below drops — only ADDRESSABILITY matters
    # there, not content, and extending the right reflect pad is free while
    # a second zero-pad op was a full 164 MB read+write pass (0.64 ms of
    # the B=256 AudioNTT step, XProf 2026-08-19).
    L = wav.shape[-1] + 2 * pad
    Lp = (L // hop + 2) * hop
    x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad + Lp - L)],
                mode="reflect")
    xb = x.reshape(x.shape[:-1] + (Lp // hop, hop))
    bidx = starts.astype(jnp.int32)[:, None] + np.arange(n_blocks)[None, :]
    seg = jnp.take_along_axis(xb, bidx[..., None], axis=-2)
    seg = seg.reshape(x.shape[:-1] + (n_blocks * hop,))[..., :seg_len]
    p = _prec(fast)
    frame_starts = np.arange(out_frames) * spec.hop_length
    folded = spec.dft_matrices_mel_folded
    if folded is not None:
        e, o = _fold_frames(seg, spec, frame_starts)            # (B, T', h)
        C_half, S_half = folded
        re = jnp.matmul(e, jnp.asarray(C_half), precision=p)
        im = jnp.matmul(o, jnp.asarray(S_half), precision=p)
    else:
        idx = frame_starts[:, None] + np.arange(spec.n_fft)[None, :]
        frames = seg[:, idx]                                    # (B, T', n_fft)
        C, S = spec.dft_matrices_mel
        re = jnp.matmul(frames, jnp.asarray(C), precision=p)
        im = jnp.matmul(frames, jnp.asarray(S), precision=p)
    power = re * re + im * im
    mel = jnp.matmul(power, jnp.asarray(spec.filterbank_mel), precision=p)
    return jnp.log(jnp.swapaxes(mel, -1, -2) + TORCH_FLOAT32_EPS)
