"""Input-pipeline overlap on a real on-disk dataset: fabricate an
FSD50K-layout lms tree, train AudioNTT on it, and report the Trainer's own
data_time vs step_time split (reference main.py:44-156 tqdm segmentation).

The point is production-readiness evidence: the C++ native batch reader
(`native/npy_batch_loader.cc`) + prefetching DataLoader must keep t_data
negligible against the jitted step, on the real device, reading real files.

    python tools/bench_pipeline.py --n_files 2000 --epochs 2 --batch 256
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_fsd50k(root: str, n_files: int, frames: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    gt = os.path.join(root, "FSD50K/FSD50K.ground_truth")
    lms = os.path.join(root, "FSD50K_lms/FSD50K.dev_audio")
    os.makedirs(gt, exist_ok=True)
    os.makedirs(lms, exist_ok=True)
    with open(os.path.join(gt, "vocabulary.csv"), "w") as f:
        w = csv.writer(f)
        w.writerow(["index", "display", "mids"])
        for i in range(10):
            w.writerow([i, f"c{i}", f"/m/{i}"])
    rows = []
    for i in range(n_files):
        np.save(os.path.join(lms, f"f{i}.npy"),
                rng.standard_normal((64, frames)).astype(np.float32))
        rows.append([f"f{i}", f"c{i % 10}", f"/m/{i % 10}", "train"])
    with open(os.path.join(gt, "dev.csv"), "w") as f:
        csv.writer(f).writerows(rows)


def fabricate_audioset_wav(root: str, n_files: int, seconds: float = 10.0,
                           sr: int = 16000, seed: int = 0):
    """AudioSet-layout wav tree: int16 mono clips + segment/label CSVs."""
    from scipy.io import wavfile

    base = os.path.join(root, "audioset")
    ident = "unbalanced_train_segments"
    os.makedirs(os.path.join(base, ident), exist_ok=True)
    with open(os.path.join(base, "class_labels_indices.csv"), "w") as f:
        f.write("index,mid,display_name\n")
        for i in range(10):
            f.write(f"{i},/m/{i},c{i}\n")
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    with open(os.path.join(base, f"{ident}-downloaded.csv"), "w") as f:
        for i in range(n_files):
            wav = (rng.standard_normal(n) * 3000).astype(np.int16)
            wavfile.write(os.path.join(base, ident, f"w{i}.wav"), sr, wav)
            f.write(f"w{i},/m/{i % 10},{ident}\n")
    open(os.path.join(base, "balanced_train_segments-downloaded.csv"),
         "w").close()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="audiontt")
    p.add_argument("--mask", action="store_true", default=False)
    p.add_argument("--n_files", type=int, default=2000)
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--wav", action="store_true", default=False,
                   help="AudioSet wav tree + C++ wav decode + device "
                        "frontend (the headline fused bf16 config)")
    p.add_argument("--use_fp16", action="store_true", default=False)
    # default None = the config's auto mode (fused kernel on real TPU)
    p.add_argument("--fused_conv", action="store_true", default=None)
    p.add_argument("--fast_mel", action="store_true", default=False)
    args = p.parse_args(argv)

    from ssl_audio_tpu.config import default_config

    tmp = args.data_dir or tempfile.mkdtemp(prefix="pipe_bench_")
    if args.wav:
        print(f"fabricating {args.n_files} 10-s wavs under {tmp} ...")
        fabricate_audioset_wav(tmp, args.n_files)
    else:
        print(f"fabricating {args.n_files} lms files under {tmp} ...")
        fabricate_fsd50k(tmp, args.n_files, args.frames)

    cfg = default_config(
        model_type=args.model,
        dataset="audioset_wav" if args.wav else "fsd50k",
        batch_size=args.batch,
        epochs=args.epochs, num_workers=args.num_workers, no_eval=True,
        steps_per_dispatch=args.steps_per_dispatch,
        mask=args.mask, mask_ratio=0.3 if args.mask else 0.0,
        use_fp16=args.use_fp16, fused_conv=args.fused_conv,
        fast_mel=args.fast_mel,
    )
    from ssl_audio_tpu.train.loop import Trainer

    trainer = Trainer(cfg, data_dir=tmp)
    native = trainer.loader._native_reader() is not None
    print(f"native C++ reader active: {native}")
    for ep in range(1, args.epochs + 1):
        trainer.train_one_epoch(ep)   # prints data_time / step_time / samples/s


if __name__ == "__main__":
    main()
