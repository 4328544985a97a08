"""Host-side datasets (reference datasets.py).

Same on-disk formats as the reference — FSD50K ground-truth CSVs, LibriSpeech
json index, NSynth HEAR json, AudioSet download CSV — and the same per-sample
recipe: load pre-computed `.npy` log-mel (or decode wav -> mel via the
GEMM frontend), random time-crop/pad to crop_frames, dataset-stat normalize
(datasets.py:70-124).  Augmentation does NOT happen here: it runs on device
inside the train step, which is the central TPU-first design change
(SURVEY.md §3.1 hot-loop).

Each dataset returns float32 numpy (1, n_mels, crop_frames) + label.
"""
from __future__ import annotations

import csv
import json
import os
from typing import Optional, Tuple

import numpy as np

# dataset-stat normalization constants (reference main.py:270,283,293)
NORM_STATS = {
    "fsd50k": (-4.950, 5.855),
    "librispeech": (-3.332, 4.205),
    "audioset": (-0.8294, 4.6230),
    "nsynth": (-8.82, 7.03),
}


def make_index_dict(label_csv: str) -> dict:
    """mids -> index lookup (reference datasets.py:17-23)."""
    index_lookup = {}
    with open(label_csv, "r") as f:
        for row in csv.DictReader(f):
            index_lookup[row["mids"]] = row["index"]
    return index_lookup


def load_wav(path: str, sample_rate: int) -> np.ndarray:
    """Mono float32 waveform at the requested rate (integer-factor resample
    only; the reference assumes pre-resampled 16 kHz audio)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if sr != sample_rate:
        if sr % sample_rate == 0:
            data = data[:: sr // sample_rate]
        else:
            from scipy.signal import resample_poly

            g = np.gcd(sr, sample_rate)
            data = resample_poly(data, sample_rate // g, sr // g).astype(np.float32)
    return data


def crop_or_pad(lms: np.ndarray, crop_frames: int, rng: np.random.Generator) -> np.ndarray:
    """Random time-crop / zero-pad to crop_frames (datasets.py:86-95)."""
    length = lms.shape[-1]
    if length > crop_frames:
        start = int(rng.integers(0, length - crop_frames))
        lms = lms[..., start : start + crop_frames]
    elif length < crop_frames:
        pad = [(0, 0)] * (lms.ndim - 1) + [(0, crop_frames - length)]
        lms = np.pad(lms, pad)
    return lms.astype(np.float32)


class _LMSDatasetBase:
    """Shared __getitem__ machinery for lms-or-wav datasets."""

    def __init__(self, cfg, transform=None, norm_stats=None, crop_frames=None, seed=0):
        self.cfg = cfg
        self.transform = transform         # host-side transform hook (rare)
        self.norm_stats = norm_stats
        self.crop_frames = cfg.crop_frames if crop_frames is None else crop_frames
        self.rng = np.random.default_rng(seed)
        self._mel = None

    @property
    def supports_native(self) -> bool:
        """Whether the C++ batch loader can serve this dataset: pure `.npy`
        reads with no host-side transform."""
        return bool(self.cfg.load_lms) and self.transform is None and hasattr(
            self, "batch_paths"
        )

    def _to_lms_from_wav(self, path: str) -> np.ndarray:
        from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram

        if self._mel is None:
            self._mel = MelSpec.from_config(self.cfg)
        wav = load_wav(path, self.cfg.sample_rate)
        unit_length = int(self.cfg.unit_sec * self.cfg.sample_rate)
        # zero pad both ends, then random unit-length crop (datasets.py:105-113)
        adj = unit_length - len(wav)
        if adj > 0:
            half = adj // 2
            wav = np.pad(wav, (half, adj - half))
        adj = len(wav) - unit_length
        start = int(self.rng.integers(0, adj + 1)) if adj > 0 else 0
        wav = wav[start : start + unit_length]
        return np.asarray(log_mel_spectrogram(wav[None], self._mel))[0]

    def _finalize(self, lms: np.ndarray) -> np.ndarray:
        lms = crop_or_pad(lms, self.crop_frames, self.rng)
        if self.norm_stats is not None:
            lms = (lms - self.norm_stats[0]) / self.norm_stats[1]
        if self.transform is not None:
            lms = self.transform(lms)
        return lms.astype(np.float32)

    def _load_item(self, npy_path: str, wav_path: str) -> np.ndarray:
        if self.cfg.load_lms:
            lms = np.load(npy_path)[None]                  # (1, n_mels, T)
        else:
            lms = self._to_lms_from_wav(wav_path)[None]
        return self._finalize(lms)


class FSD50K(_LMSDatasetBase):
    """reference datasets.py:26-124."""

    def __init__(self, cfg, split="train", transform=None, norm_stats=None,
                 crop_frames=None, data_dir="data", seed=0):
        super().__init__(cfg, transform, norm_stats, crop_frames, seed)
        self.split = split
        self.data_dir = data_dir
        gt = os.path.join(data_dir, "FSD50K/FSD50K.ground_truth")
        csv_path = os.path.join(gt, "eval.csv" if split == "test" else "dev.csv")
        rows = []
        with open(csv_path) as f:
            for row in csv.reader(f):
                rows.append(row)
        if split == "train":
            rows = [r for r in rows if len(r) > 3 and r[3] == "train"]
        elif split == "val":
            rows = [r for r in rows if len(r) > 3 and r[3] == "val"]
        self.files = [r[0] for r in rows]
        self.labels = [r[2] if len(r) > 2 else "" for r in rows]
        self.index_dict = make_index_dict(os.path.join(gt, "vocabulary.csv"))
        self.label_num = len(self.index_dict)

    def __len__(self):
        return len(self.files)

    def _label(self, idx) -> np.ndarray:
        y = np.zeros(self.label_num, np.float32)
        for s in self.labels[idx].split(","):
            if s:
                y[int(self.index_dict[s])] = 1.0
        return y

    def _npy_path(self, idx) -> str:
        sub = "FSD50K.eval_audio" if self.split == "test" else "FSD50K.dev_audio"
        return os.path.join(self.data_dir, f"FSD50K_lms/{sub}/{self.files[idx]}.npy")

    def batch_paths(self, indices):
        return [self._npy_path(int(i)) for i in indices], [self._label(int(i)) for i in indices]

    def __getitem__(self, idx) -> Tuple[np.ndarray, np.ndarray]:
        fname = self.files[idx]
        sub = "FSD50K.eval_audio" if self.split == "test" else "FSD50K.dev_audio"
        lms = self._load_item(
            self._npy_path(idx),
            os.path.join(self.data_dir, f"FSD50K/{sub}/{fname}.wav"),
        )
        return lms, self._label(idx)


class LibriSpeech(_LMSDatasetBase):
    """reference datasets.py:127-209; labels are dummies."""

    def __init__(self, cfg, train=True, transform=None, norm_stats=None,
                 n_dummy=200, data_dir="data", seed=0):
        super().__init__(cfg, transform, norm_stats, None, seed)
        self.n_dummy = n_dummy
        base = "LibriSpeech_lms" if cfg.load_lms else "LibriSpeech"
        self.base_path = os.path.join(data_dir, base)
        with open(os.path.join(self.base_path, "librispeech_tr960_cut.json")) as fp:
            self.data = json.load(fp)["data"]

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        fname = self.data[idx]["wav"]
        lms = self._load_item(
            os.path.join(self.base_path, fname[: -len(".flac")] + ".npy"),
            os.path.join(self.base_path, fname),
        )
        return lms, np.zeros(self.n_dummy, np.float32)


class NSynthHEAR(_LMSDatasetBase):
    """reference datasets.py:212-290 (pitch -> class index)."""

    def __init__(self, cfg, split="train", transform=None, norm_stats=None,
                 data_dir="data", hear_dir="hear", seed=0):
        super().__init__(cfg, transform, norm_stats, None, seed)
        self.split = split
        self.data_dir = data_dir
        base = os.path.join(hear_dir, "tasks/nsynth_pitch-v2.2.3-50h")
        self.wav_dir = os.path.join(base, f"16000/{split}")
        with open(os.path.join(base, f"{split}.json")) as fp:
            data = json.load(fp)
        self.data = [(name, label[0]) for name, label in data.items()]
        self.label_num = 88  # MIDI pitches 21-108 (reference sweep.py CLASSES)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        fname, label = self.data[idx]
        lms = self._load_item(
            os.path.join(
                self.data_dir,
                f"nsynth_lms/nsynth-{self.split}/audio/{fname[:-len('.wav')]}.npy",
            ),
            os.path.join(self.wav_dir, fname),
        )
        return lms, np.int32(int(label) - 21)


class AudioSet(_LMSDatasetBase):
    """reference datasets.py:293-359 — `.npy` lms only, '#'-separated labels,
    corrupt-file fallback to a random FSD50K sample (335-340).

    test=True selects the eval-segments split (the AudioSet-20k probe
    protocol evaluates on eval segments, not training data:
    old/data_manager/audioset_lms.py:72-78 `eval_segments-downloaded.csv`,
    old/evaluate/linear.py test loaders)."""

    def __init__(self, cfg, transform=None, norm_stats=None, data_dir="data",
                 seed=0, test=False):
        super().__init__(cfg, transform, norm_stats, None, seed)
        self.base_dir = os.path.join(data_dir, "audioset_lms")
        self.data_dir = data_dir
        self.segments_dir = "eval_segments" if test else "unbalanced_train_segments"
        csv_name = ("eval_segments-downloaded.csv" if test
                    else "unbalanced_train_segments-downloaded.csv")
        rows = []
        with open(os.path.join(self.base_dir, csv_name)) as f:
            for row in csv.reader(f):
                rows.append(row)
        self.audio_fnames = [r[0] for r in rows]
        self.labels = [r[1] for r in rows]
        self.index_dict = make_index_dict(os.path.join(self.base_dir, "class_labels_indices.csv"))
        self.label_num = len(self.index_dict)
        try:
            with open(os.path.join(data_dir, "FSD50K/FSD50K.ground_truth/dev.csv")) as f:
                self.files_fsd50k = [row[0] for row in csv.reader(f)]
        except FileNotFoundError:
            self.files_fsd50k = []

    def __len__(self):
        return len(self.audio_fnames)

    def _label(self, idx) -> np.ndarray:
        y = np.zeros(self.label_num, np.float32)
        for s in self.labels[idx].split("#"):
            if s:
                y[int(self.index_dict[s])] = 1.0
        return y

    def batch_paths(self, indices):
        paths = [
            os.path.join(self.base_dir, self.segments_dir,
                         f"{self.audio_fnames[int(i)]}.npy")
            for i in indices
        ]
        return paths, [self._label(int(i)) for i in indices]

    def __getitem__(self, idx):
        fname = self.audio_fnames[idx]
        y = self._label(idx)
        path = os.path.join(self.base_dir, self.segments_dir, f"{fname}.npy")
        try:
            lms = np.load(path)[None]
        except (ValueError, FileNotFoundError):
            if not self.files_fsd50k:
                raise
            alt = self.rng.choice(self.files_fsd50k)
            lms = np.load(
                os.path.join(self.data_dir, f"FSD50K_lms/FSD50K.dev_audio/{alt}.npy")
            )[None]
        return self._finalize(lms), y


class AudioSetWav:
    """Wav-domain AudioSet (reference old/data_manager/audioset.py:41-212):
    CSV-driven balanced/unbalanced/eval segment selection with the 200k cap,
    stereo->mono decode, zero-pad both ends + random unit-length crop.

    Returns raw (unit_length,) float32 waveforms + multi-hot labels; the
    reference's host-side mel/normalize/n-views (audioset.py:160-212) run on
    device instead — the train step's frontend (make_device_frontend) does
    mel+crop+normalize and make_views builds both views, so one wav upload
    replaces n_views host-side spectrogram copies."""

    returns_wav = True
    supports_native = True   # C++ batch decode (native/wav_batch_loader.cc)

    def __init__(self, cfg, base_dir="data/audioset", balanced_only=False,
                 test=False, twohundredk_only=False, cap=int(2e5), seed=0):
        self.cfg = cfg
        self.base_dir = base_dir
        self.unit_length = int(cfg.unit_sec * cfg.sample_rate)
        self.rng = np.random.default_rng(seed)

        def read(name):
            path = os.path.join(base_dir, name)
            with open(path) as f:
                return [row for row in csv.reader(f) if row]

        if test:
            rows = read("eval_segments-downloaded.csv")
        elif balanced_only:
            rows = read("balanced_train_segments-downloaded.csv")
        else:
            rows = (read("unbalanced_train_segments-downloaded.csv")
                    + read("balanced_train_segments-downloaded.csv"))
            if twohundredk_only:
                rows = rows[:cap]
        self.audio_fnames = [r[0] for r in rows]
        self.labels = [r[1] for r in rows]
        self.ident = [r[2] for r in rows]

        # reference old make_index_dict uses column 'mid'
        # (audioset.py:30-37); the active tree renamed it 'mids'
        self.index_dict = {}
        with open(os.path.join(base_dir, "class_labels_indices.csv")) as f:
            for row in csv.DictReader(f):
                mid = row.get("mid", row.get("mids"))
                self.index_dict[mid] = row["index"]
        self.label_num = len(self.index_dict)

    def __len__(self):
        return len(self.audio_fnames)

    def _label(self, idx) -> np.ndarray:
        y = np.zeros(self.label_num, np.float32)
        for s in self.labels[idx].split("#"):
            if s:
                y[int(self.index_dict[s])] = 1.0
        return y

    def _wav_path(self, idx) -> str:
        return os.path.join(
            self.base_dir, self.ident[idx], f"{self.audio_fnames[idx]}.wav"
        )

    def batch_paths(self, batch_idx):
        """(paths, labels) for the DataLoader's C++ wav fast path."""
        return ([self._wav_path(i) for i in batch_idx],
                [self._label(i) for i in batch_idx])

    def __getitem__(self, idx):
        y = self._label(idx)
        wav_path = self._wav_path(idx)
        from scipy.io import wavfile

        sr, wav = wavfile.read(wav_path)
        assert sr == self.cfg.sample_rate, (
            f"Convert .wav files to {self.cfg.sample_rate} Hz. "
            f"{self.audio_fnames[idx]}.wav has {sr} Hz."
        )
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        else:
            wav = wav.astype(np.float32)
        if wav.ndim == 2:                        # stereo -> mono
            wav = wav.mean(axis=1)
        adj = self.unit_length - len(wav)
        if adj > 0:                              # zero pad both ends
            half = adj // 2
            wav = np.pad(wav, (half, adj - half))
        adj = len(wav) - self.unit_length        # random unit-length crop
        start = int(self.rng.integers(0, adj + 1)) if adj > 0 else 0
        return wav[start : start + self.unit_length].astype(np.float32), y


class SyntheticLMS:
    """Random log-mel clips for smoke tests and benches (no reference
    equivalent; enabled by --dataset synthetic)."""

    def __init__(self, cfg, length: Optional[int] = None, n_classes=10, seed=0,
                 env_gain=2.0, env_width=0.08, noise=0.5):
        self.cfg = cfg
        self.length = length if length is not None else cfg.synthetic_len
        self.n_classes = n_classes
        self.seed = seed
        self.label_num = n_classes
        self.env_gain = env_gain
        self.env_width = env_width
        self.noise = noise

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        cls = idx % self.n_classes
        # class-dependent spectral envelope so probes have signal; env_gain/
        # env_width/noise control task difficulty (low gain + wide overlap +
        # heavy noise makes random-feature probes fail, for learning proofs)
        mel_axis = np.linspace(0, 1, self.cfg.n_mels)[:, None]
        env = np.exp(
            -0.5 * ((mel_axis - (cls + 0.5) / self.n_classes) / self.env_width) ** 2
        )
        lms = rng.standard_normal((1, self.cfg.n_mels, self.cfg.crop_frames)).astype(np.float32)
        lms = lms * self.noise + self.env_gain * env[None].astype(np.float32)
        y = np.zeros(self.n_classes, np.float32)
        y[cls] = 1.0
        return lms, y


class SyntheticMultiCue:
    """Synthetic task whose class signal SURVIVES the full BYOL-A
    augmentation suite (learning-proof design, VERDICT r2 #2).

    Each class jointly encodes two independent cues:
      * a spectral envelope position (n_env coarse bands), and
      * a temporal amplitude-modulation rate (n_rate geometric rates).
    RandomResizeCrop warps each axis by U(0.6, 1.5) per view, which jitters
    the observed band position / AM rate but cannot erase BOTH cues at once
    (band spacing 1/n_env and rate ratio ``rate_ratio`` are chosen wider
    than the warp); mixup's linear-power contamination (alpha <= 0.2*U) and
    the linear fader leave the dominant envelope/modulation intact.  The
    single-cue SyntheticLMS packs 20 envelope positions 0.05 apart — under
    a +-0.3 RRC shift the only cue decorrelates between views and the BT
    objective eventually suppresses it (measured collapse in PERF.md r2)."""

    def __init__(self, cfg, length: Optional[int] = None, n_env=4, n_rate=5,
                 seed=0, gain=1.2, env_width=0.09, noise=1.0,
                 rate_min=2.0, rate_ratio=2.2, am_depth=0.9):
        self.cfg = cfg
        self.length = length if length is not None else cfg.synthetic_len
        self.n_env = n_env
        self.n_rate = n_rate
        self.n_classes = n_env * n_rate
        self.label_num = self.n_classes
        self.seed = seed
        self.gain = gain
        self.env_width = env_width
        self.noise = noise
        self.rate_min = rate_min
        self.rate_ratio = rate_ratio
        self.am_depth = am_depth

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        cls = idx % self.n_classes
        e, r = cls % self.n_env, cls // self.n_env
        F, T = self.cfg.n_mels, self.cfg.crop_frames
        mel = np.linspace(0, 1, F)[:, None]
        center = (e + 0.5) / self.n_env
        env = np.exp(-0.5 * ((mel - center) / self.env_width) ** 2)
        rate = self.rate_min * self.rate_ratio ** r          # cycles per clip
        t = np.linspace(0, 1, T)[None, :]
        phase = rng.uniform(0, 2 * np.pi)
        am = 1.0 + self.am_depth * np.sin(2 * np.pi * rate * t + phase)
        lms = rng.standard_normal((1, F, T)).astype(np.float32) * self.noise
        lms += (self.gain * env * am)[None].astype(np.float32)
        y = np.zeros(self.n_classes, np.float32)
        y[cls] = 1.0
        return lms, y


def calculate_norm_stats(dataset, n_norm_calc=10000, seed=0):
    """reference datasets.py:362-376."""
    rng = np.random.default_rng(seed)
    idxs = rng.integers(0, len(dataset), size=min(n_norm_calc, len(dataset)))
    vecs = np.stack([dataset[int(i)][0] for i in idxs])
    mean = float(vecs.mean())
    std = float(vecs.std() + np.finfo(np.float32).eps)
    return mean, std


class SyntheticWav:
    """Random fixed-length waveforms for the on-device-frontend training mode
    (wav -> mel -> crop -> augment inside the jitted step)."""

    returns_wav = True

    def __init__(self, cfg, length: Optional[int] = None, clip_seconds: float = 10.0,
                 n_classes: int = 10, seed: int = 0):
        self.cfg = cfg
        self.length = length if length is not None else cfg.synthetic_len
        self.n_samples = int(clip_seconds * cfg.sample_rate)
        self.n_classes = n_classes
        self.label_num = n_classes
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 999_983 + idx)
        cls = idx % self.n_classes
        t = np.arange(self.n_samples) / self.cfg.sample_rate
        f0 = 200.0 * (1.3 ** cls)
        wav = 0.2 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(self.n_samples)
        y = np.zeros(self.n_classes, np.float32)
        y[cls] = 1.0
        return wav.astype(np.float32), y


class WavClips:
    """Generic directory-of-wavs dataset for the on-device-frontend mode:
    fixed-length (pad/crop) raw waveforms + dummy labels."""

    returns_wav = True

    def __init__(self, cfg, wav_dir: str, clip_seconds: float = 10.0, seed: int = 0):
        self.cfg = cfg
        self.n_samples = int(clip_seconds * cfg.sample_rate)
        self.rng = np.random.default_rng(seed)
        self.paths = []
        for root, _d, files in os.walk(wav_dir):
            for f in sorted(files):
                if f.lower().endswith(".wav"):
                    self.paths.append(os.path.join(root, f))
        if not self.paths:
            raise FileNotFoundError(f"no .wav files under {wav_dir}")
        self.label_num = 1

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        wav = load_wav(self.paths[idx], self.cfg.sample_rate)
        if len(wav) >= self.n_samples:
            start = int(self.rng.integers(0, len(wav) - self.n_samples + 1))
            wav = wav[start : start + self.n_samples]
        else:
            wav = np.pad(wav, (0, self.n_samples - len(wav)))
        return wav.astype(np.float32), np.zeros(1, np.float32)
