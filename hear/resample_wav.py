"""Offline wav resampling to 16 kHz (reference hear/resample_wav.py:52-67),
using a process pool over the input tree.

Usage:
    python hear/resample_wav.py --in_dir <wavs> --out_dir <wavs16k> [--sr 16000]
"""
from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

import numpy as np


def resample_one(args):
    in_path, out_path, sr = args
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    in_sr, data = wavfile.read(in_path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if in_sr != sr:
        g = np.gcd(int(in_sr), sr)
        data = resample_poly(data, sr // g, in_sr // g).astype(np.float32)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    wavfile.write(out_path, sr, (np.clip(data, -1, 1) * 32767).astype(np.int16))
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--workers", type=int, default=os.cpu_count())
    args = p.parse_args()

    jobs = []
    for root, _dirs, files in os.walk(args.in_dir):
        for f in files:
            if f.lower().endswith(".wav"):
                in_path = os.path.join(root, f)
                rel = os.path.relpath(in_path, args.in_dir)
                jobs.append((in_path, os.path.join(args.out_dir, rel), args.sr))
    with Pool(args.workers) as pool:
        for i, _ in enumerate(pool.imap_unordered(resample_one, jobs)):
            if i % 1000 == 0:
                print(f"{i}/{len(jobs)}")
    print(f"Resampled {len(jobs)} files -> {args.out_dir}")


if __name__ == "__main__":
    main()
