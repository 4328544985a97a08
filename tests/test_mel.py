"""Parity tests for the GEMM-native mel frontend against the exact torchaudio
semantics the reference uses (datasets.py:39-48).

torchaudio is not installed here, so the oracle is built from its documented
algorithm: torch.stft (the same C++ kernel torchaudio.transforms.Spectrogram
calls, with center=True / reflect pad / periodic hann / onesided) followed by
an independently-written HTK mel filterbank (torchaudio.functional
.melscale_fbanks semantics, norm=None).
"""
import numpy as np
import pytest
import torch

from ssl_audio_tpu.ops.mel import (
    TORCH_FLOAT32_EPS,
    MelSpec,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    mel_spectrogram,
    power_spectrogram,
)


def torch_power_spec(wav: np.ndarray, spec: MelSpec) -> np.ndarray:
    x = torch.from_numpy(wav).float()
    win = torch.hann_window(spec.win_length, periodic=True)
    st = torch.stft(
        x,
        n_fft=spec.n_fft,
        hop_length=spec.hop_length,
        win_length=spec.win_length,
        window=win,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return (st.abs() ** 2).numpy()  # (..., n_freqs, T)


def librosa_style_fb(spec: MelSpec) -> np.ndarray:
    """Second, independently-coded HTK filterbank for cross-checking."""
    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, spec.sample_rate / 2, spec.n_freqs)
    mels = np.linspace(to_mel(spec.f_min), to_mel(spec.f_max), spec.n_mels + 2)
    fpts = from_mel(mels)
    fb = np.zeros((spec.n_freqs, spec.n_mels))
    for m in range(spec.n_mels):
        lo, ce, hi = fpts[m], fpts[m + 1], fpts[m + 2]
        up = (freqs - lo) / (ce - lo)
        down = (hi - freqs) / (hi - ce)
        fb[:, m] = np.clip(np.minimum(up, down), 0, None)
    return fb


@pytest.fixture(scope="module")
def spec():
    return MelSpec()


def test_hann_window_matches_torch(spec):
    ours = hann_window(1024)
    theirs = torch.hann_window(1024, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-7)


def test_filterbank_matches_independent_impl(spec):
    fb = mel_filterbank(spec.n_freqs, spec.f_min, spec.f_max, spec.n_mels, spec.sample_rate)
    fb2 = librosa_style_fb(spec)
    np.testing.assert_allclose(fb, fb2, atol=1e-6)
    # every mel bin must collect some energy for these params
    assert (fb.sum(axis=0) > 0).all()


def test_power_spectrogram_parity(spec, rng):
    wav = rng.standard_normal((2, 15200)).astype(np.float32)
    ours = np.asarray(power_spectrogram(wav, spec))
    ref = torch_power_spec(wav, spec)
    assert ours.shape == ref.shape == (2, 513, 96)
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_log_mel_parity(spec, rng):
    wav = (0.5 * rng.standard_normal((3, 15200))).astype(np.float32)
    power = torch_power_spec(wav, spec)                       # (3, 513, T)
    fb = librosa_style_fb(spec)
    ref_mel = np.einsum("bft,fm->bmt", power, fb)
    ref = np.log(ref_mel + TORCH_FLOAT32_EPS)
    ours = np.asarray(log_mel_spectrogram(wav, spec))
    assert ours.shape == (3, 64, 96)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_hear_win400_frames(spec, rng):
    """HEAR inference uses win_length=400 < n_fft (hear/config.yaml)."""
    s = MelSpec(win_length=400)
    wav = rng.standard_normal((1, 15200)).astype(np.float32)
    ref = torch_power_spec(wav, s)
    ours = np.asarray(power_spectrogram(wav, s))
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_num_frames(spec):
    assert spec.num_frames(15200) == 96  # 0.95 s @ 16 kHz -> 96 frames
    assert spec.num_frames(160000) == 1001  # 10 s


def test_cropped_log_mel_matches_full(spec, rng):
    """log_mel_spectrogram_cropped(starts) == full log-mel sliced at starts."""
    import jax
    import jax.numpy as jnp

    from ssl_audio_tpu.ops.mel import log_mel_spectrogram_cropped

    wav = jnp.asarray(rng.standard_normal((3, 32000)).astype(np.float32))
    full = np.asarray(log_mel_spectrogram(wav, spec))
    starts = jnp.asarray([0, 5, full.shape[-1] - 96])
    crop = np.asarray(log_mel_spectrogram_cropped(wav, spec, starts, 96))
    for b, s in enumerate(np.asarray(starts)):
        np.testing.assert_allclose(crop[b], full[b, :, s : s + 96], atol=1e-5)


def test_fast_mode_close_to_exact(spec, rng):
    """fast=True (Precision.HIGH, 3-pass bf16 on TPU) must stay within the
    documented 1.5e-4 band of the HIGHEST path (identical on CPU)."""
    wav = (0.5 * rng.standard_normal((2, 15200))).astype(np.float32)
    exact = np.asarray(log_mel_spectrogram(wav, spec))
    fast = np.asarray(log_mel_spectrogram(wav, spec, True))
    np.testing.assert_allclose(fast, exact, atol=5e-4)


def test_pallas_fused_kernel_parity(spec, rng):
    """Fused framing+DFT+mel+log Pallas kernel == the XLA path (interpret
    mode off-TPU; the real-TPU measured parity is recorded in PERF.md)."""
    import jax.numpy as jnp

    from ssl_audio_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

    wav = (0.3 * rng.standard_normal((2, 32000))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav), spec))
    out = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(wav), spec))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_multipass_modes(spec, rng):
    """Hand-rolled bf16 multi-pass modes vs the fp32 path: "precise"
    (6-pass, 3-part splits — XLA HIGHEST's own decomposition) must sit in
    the ~1e-5 band; "fast" (3-pass) in the documented 1.5e-4 band."""
    import jax.numpy as jnp

    from ssl_audio_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

    wav = (0.3 * rng.standard_normal((2, 32000))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav), spec))
    precise = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(wav), spec, mode="precise"))
    fast = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(wav), spec, mode="fast"))
    np.testing.assert_allclose(precise, ref, atol=5e-5)
    np.testing.assert_allclose(fast, ref, atol=5e-4)


def test_pallas_folded_kernel(spec, rng):
    """The folded Pallas kernel (half-size e/o GEMMs fed by the reversed
    row stream) must match the unfolded kernel and the XLA oracle in every
    mode; windows that don't admit the streaming fold (w[0] != 0) must
    route to the unfolded kernel under fold=None and reject fold=True."""
    import jax.numpy as jnp
    import pytest

    from ssl_audio_tpu.ops.mel_pallas import (
        _chunked_cs_matrix_folded, log_mel_spectrogram_pallas)

    wav = (0.3 * rng.standard_normal((2, 32000))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav), spec))
    for mode, atol in [("f32", 1e-5), ("fast", 5e-4), ("precise", 5e-5)]:
        folded = np.asarray(log_mel_spectrogram_pallas(
            jnp.asarray(wav), spec, mode=mode, fold=True))
        unfolded = np.asarray(log_mel_spectrogram_pallas(
            jnp.asarray(wav), spec, mode=mode, fold=False))
        np.testing.assert_allclose(folded, ref, atol=atol)
        # fold is the same sums pairwise-reassociated: kernels agree to
        # accumulation-order noise, far inside the oracle band
        np.testing.assert_allclose(folded, unfolded, atol=atol)

    # odd frame counts / non-tile-multiple T exercise the tail tile
    short = (0.3 * rng.standard_normal((1, 4801))).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(log_mel_spectrogram_pallas(jnp.asarray(short), spec,
                                              fold=True)),
        np.asarray(log_mel_spectrogram(jnp.asarray(short), spec)),
        atol=1e-5)

    # a boxcar window has w[0] != 0: the streaming fold's n=0 column would
    # read x[s + n_fft] against a nonzero weight -> must not fold
    import dataclasses
    boxcar = dataclasses.replace(spec, win_length=spec.n_fft)
    boxcar.__dict__["window"] = np.ones(spec.n_fft)  # seed cached_property
    assert _chunked_cs_matrix_folded(boxcar) is None
    with pytest.raises(ValueError):
        log_mel_spectrogram_pallas(jnp.asarray(wav), boxcar, fold=True)
