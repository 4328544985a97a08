"""ctypes bindings for the C++ npy batch loader (native/npy_batch_loader.cc).

Builds the shared library on first use (g++ -O3 -shared); falls back cleanly
when no compiler is available.  `NativeBatchReader` assembles a whole
(B, 1, n_mels, crop_frames) normalized batch from `.npy` paths with a C++
thread pool — the framework's replacement for torch DataLoader's C++ workers.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "npy_batch_loader.cc")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libnpy_batch_loader.so")

_lib = None


def _build() -> str:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.read_npy_batch.restype = ctypes.c_int
        lib.read_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_ulonglong,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return lib
    except (OSError, subprocess.CalledProcessError):
        return None


def native_available() -> bool:
    return get_lib() is not None


class NativeBatchReader:
    """Batch assembly: paths -> normalized (B, 1, n_mels, crop_frames)."""

    def __init__(self, n_mels: int, crop_frames: int, mean: float, std: float,
                 n_threads: int = 8):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self.n_mels = n_mels
        self.crop_frames = crop_frames
        self.mean = float(mean)
        self.inv_std = 1.0 / float(std)
        self.n_threads = n_threads

    def read(self, paths: List[str], seed: int = 0) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, 1, self.n_mels, self.crop_frames), np.float32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self.lib.read_npy_batch(
            c_paths, n, self.n_mels, self.crop_frames,
            self.mean, self.inv_std, seed, self.n_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native loader failed on {paths[rc - 1]}")
        return out


# --- wav batch loader (native/wav_batch_loader.cc) --------------------------

_WAV_SRC = os.path.join(os.path.dirname(_SRC), "wav_batch_loader.cc")
_WAV_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libwav_batch_loader.so")

_wav_lib = None


def get_wav_lib() -> Optional[ctypes.CDLL]:
    global _wav_lib
    if _wav_lib is not None:
        return _wav_lib
    try:
        if not os.path.exists(_WAV_LIB_PATH) or (
            os.path.getmtime(_WAV_LIB_PATH) < os.path.getmtime(_WAV_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 _WAV_SRC, "-o", _WAV_LIB_PATH],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_WAV_LIB_PATH)
        lib.read_wav_batch.restype = ctypes.c_int
        lib.read_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_ulonglong, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _wav_lib = lib
        return lib
    except (OSError, subprocess.CalledProcessError):
        return None


def native_wav_available() -> bool:
    return get_wav_lib() is not None


class NativeWavReader:
    """Batch wav decode: paths -> (B, unit_length) float32 mono waveforms
    (stereo averaged, zero-padded both ends / random-cropped — the
    AudioSetWav item semantics, datasets.py:358-377, assembled by the C++
    thread pool instead of per-item Python)."""

    def __init__(self, unit_length: int, sample_rate: int, n_threads: int = 8):
        self.lib = get_wav_lib()
        if self.lib is None:
            raise RuntimeError("native wav loader unavailable (no g++?)")
        self.unit_length = int(unit_length)
        self.sample_rate = int(sample_rate)
        self.n_threads = n_threads

    def read(self, paths: List[str], seed: int = 0) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, self.unit_length), np.float32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self.lib.read_wav_batch(
            c_paths, n, self.unit_length, self.sample_rate, seed,
            self.n_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native wav loader failed on {paths[rc - 1]}")
        return out
