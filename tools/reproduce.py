"""Turnkey quality-reproduction chain (reference readme protocol;
hear/extract_results.py:12-90): one driver running

    wav tree -> tools/wav_to_lms.py      (offline mel conversion)
             -> main.py                  (Barlow-Twins pretrain)
             -> linear.py                (FSD50K linear probe + low-shot)
             -> HEAR scene embeddings + per-task probe scores
             -> hear/extract_results.py  (18-task aggregation -> results.json)

This is the chain a user with real data runs to reproduce the reference's
`hear/results.json` numbers end to end (VERDICT r2 #3).  Every stage calls
the same module entry a user would invoke by hand; the driver only wires
paths between them.

Layout expected under --root (the reference's own data layout):
    data/FSD50K/FSD50K.dev_audio/*.wav        } 16 kHz wavs
    data/FSD50K/FSD50K.eval_audio/*.wav       } (hear/resample_wav.py converts)
    data/FSD50K/FSD50K.ground_truth/{dev.csv,eval.csv,vocabulary.csv}
    hear_tasks/<task>/{train,test}/*.wav + <task>/labels.json   (optional)

The `hear` stage scores tasks with the built-in MLP probe over scene
embeddings ("internal probe protocol").  For official HEAR 2021 numbers run
the external heareval harness against hear/sample/{vit,conv}.py instead and
point --hear_scores_dir at its output; the aggregation stage consumes either.

Usage:
    python tools/reproduce.py --root . --model_type audiontt --epochs 100 \
        --batch_size 256 --name repro
    python tools/reproduce.py --root . --stages probe,hear,aggregate \
        --ckpt results/fsd50k/<run>/model_100
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

ALL_STAGES = ("convert", "pretrain", "probe", "hear", "aggregate")


def stage_convert(args) -> None:
    """wav -> log-mel .npy via the batched device frontend
    (tools/wav_to_lms.py; reference old/data_manager/wav_to_lms.py:42-108)."""
    from tools import wav_to_lms

    for sub in ("FSD50K.dev_audio", "FSD50K.eval_audio"):
        in_dir = os.path.join("data", "FSD50K", sub)
        out_dir = os.path.join("data", "FSD50K_lms", sub)
        if not os.path.isdir(in_dir):
            print(f"[convert] {in_dir} absent — skipped")
            continue
        print(f"[convert] {in_dir} -> {out_dir}")
        wav_to_lms.main(["--in_dir", in_dir, "--out_dir", out_dir]
                        + (["--fast"] if args.fast_mel else []))


def stage_pretrain(args) -> str:
    """Pretrain via the family's own entry point and return the final
    checkpoint path: barlow -> main.py (reference main.py:350-520);
    dino / byola -> main_pretrain.py (reference old/main_pretrain.py
    dispatch).  The downstream probe/HEAR stages consume any family's
    checkpoint via the encoder-graft loader
    (utils/checkpoint.load_encoder_checkpoint)."""
    if args.method != "barlow":
        import main_pretrain as mp_mod

        argv = [
            "--method", args.method, "--dataset", "fsd50k",
            "--model_type", args.model_type,
            "--epochs", str(args.epochs), "--batch_size", str(args.batch_size),
            "--no_eval",
        ]
        argv += args.extra_pretrain_args
        print(f"[pretrain] main_pretrain.py {' '.join(argv)}")
        mp_mod.main(argv)
        ckpt = os.path.join("results", "fsd50k",
                            f"{args.method}_{args.model_type}",
                            f"model_{args.epochs}")
        if not os.path.exists(ckpt):
            raise FileNotFoundError(f"pretrain produced no checkpoint {ckpt}")
        print(f"[pretrain] checkpoint: {ckpt}")
        return ckpt
    import main as main_mod

    argv = [
        "--dataset", "fsd50k", "--model_type", args.model_type,
        "--epochs", str(args.epochs), "--batch_size", str(args.batch_size),
        "--name", args.name, "--epoch_save_f", str(args.epoch_save_f),
    ]
    if args.no_eval:
        argv.append("--no_eval")
    argv += args.extra_pretrain_args
    print(f"[pretrain] main.py {' '.join(argv)}")
    main_mod.main(argv)
    pattern = os.path.join(
        "results", "fsd50k", f"{args.model_type}_{args.name}*", f"model_{args.epochs}")
    ckpts = sorted(glob.glob(pattern), key=os.path.getmtime)
    if not ckpts:
        raise FileNotFoundError(f"pretrain produced no checkpoint matching {pattern}")
    print(f"[pretrain] checkpoint: {ckpts[-1]}")
    return ckpts[-1]


def stage_probe(args, ckpt: str) -> dict:
    """FSD50K linear probe + n=5 low-shot via linear.py (reference
    linear.py:27-166)."""
    import linear as linear_mod

    argv = [
        "--dataset", "fsd50k", "--model_type", args.model_type,
        "--model_file_path", ckpt, "--model_name", args.name,
        "--model_epoch", str(args.epochs),
        "--batch_size", str(args.batch_size),
    ]
    print(f"[probe] linear.py {' '.join(argv)}")
    scores = linear_mod.main(argv)
    out = {k: ([float(x) for x in v] if isinstance(v, (tuple, list)) else float(v))
           for k, v in scores.items()}
    with open(os.path.join(args.work_dir, "linear_scores.json"), "w") as f:
        json.dump(out, f, indent=2)
    return scores


def _load_task_clips(task_dir: str, split: str, sample_rate: int):
    """(clips float32 (N, T_max) zero-padded, labels list, fnames) for one
    internal-protocol task split."""
    from scipy.io import wavfile

    with open(os.path.join(task_dir, "labels.json")) as f:
        labels = json.load(f)[split]
    fnames = sorted(labels)
    wavs = []
    for fname in fnames:
        sr, wav = wavfile.read(os.path.join(task_dir, split, fname))
        assert sr == sample_rate, f"{fname}: {sr} != {sample_rate}"
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        wav = wav.astype(np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=1)
        wavs.append(wav)
    t_max = max(len(w) for w in wavs)
    clips = np.zeros((len(wavs), t_max), np.float32)
    for i, w in enumerate(wavs):
        clips[i, : len(w)] = w
    return clips, [labels[f] for f in fnames], fnames


def stage_hear(args, ckpt: str) -> str:
    """Scene embeddings through the HEAR API surface + internal MLP probe
    per task; writes heareval-layout score files the aggregation stage
    consumes (test.predicted-scores.json per task, as the external harness
    produces)."""
    import torch

    from ssl_audio_tpu.eval.mlp_clf import MLPClassifier

    if "vit" in args.model_type:
        from ssl_audio_tpu.hear import vit as hear_mod

        model = hear_mod.load_model(ckpt, args.model_type, args.patch_size)
    else:
        from ssl_audio_tpu.hear import conv as hear_mod

        model = hear_mod.load_model(ckpt, args.model_type,
                                    fast_mel=args.fast_mel)
    sr = int(model.sample_rate)

    run_dir = os.path.join(args.hear_scores_dir, f"{args.model_type}_{args.name}",
                           f"model_{args.epochs}")
    task_dirs = sorted(glob.glob(os.path.join(args.hear_tasks_dir, "*", "labels.json")))
    if not task_dirs:
        print(f"[hear] no task dirs under {args.hear_tasks_dir} — skipped")
        return run_dir
    for labels_path in task_dirs:
        task_dir = os.path.dirname(labels_path)
        task = os.path.basename(task_dir)
        emb = {}
        y = {}
        for split in ("train", "test"):
            clips, labels, _ = _load_task_clips(task_dir, split, sr)
            e = hear_mod.get_scene_embeddings(torch.from_numpy(clips), model)
            emb[split] = np.asarray(e.detach().cpu().numpy())
            y[split] = labels
        classes = sorted(set(y["train"]) | set(y["test"]))
        to_idx = {c: i for i, c in enumerate(classes)}
        clf = MLPClassifier(hidden_layer_sizes=args.probe_hidden,
                            max_iter=args.probe_iters, early_stopping=False)
        clf.fit(emb["train"], np.asarray([to_idx[c] for c in y["train"]]))
        score = float(clf.score(emb["test"],
                                np.asarray([to_idx[c] for c in y["test"]])))
        out_dir = os.path.join(run_dir, task)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "test.predicted-scores.json"), "w") as f:
            json.dump({"test": {"test_score": score},
                       "protocol": "internal-probe"}, f, indent=2)
        print(f"[hear] {task}: {score:.4f}")
    return run_dir


def stage_aggregate(args) -> dict:
    """18-task grouping/averaging into results.json
    (hear/extract_results.py:12-90)."""
    from hear.extract_results import extract_all

    out_path = os.path.join(args.work_dir, "results.json")
    scores = extract_all(args.hear_scores_dir, out_path)
    print(f"[aggregate] {out_path}: {json.dumps(scores, indent=2)[:400]}")
    return scores


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--root", default=".", help="dir containing data/FSD50K")
    p.add_argument("--work_dir", default="reproduce_out")
    p.add_argument("--stages", default=",".join(ALL_STAGES))
    p.add_argument("--model_type", default="audiontt")
    p.add_argument("--method", default="barlow",
                   choices=["barlow", "dino", "byola"],
                   help="SSL family for the pretrain stage (dino/byola "
                        "route through main_pretrain.py)")
    p.add_argument("--patch_size", default="16x16")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--epoch_save_f", type=int, default=20)
    p.add_argument("--name", default="repro")
    p.add_argument("--ckpt", default="", help="skip pretrain, use this checkpoint")
    p.add_argument("--no_eval", action="store_true", default=False,
                   help="disable the per-epoch FSD50K probe during pretrain")
    p.add_argument("--fast_mel", action="store_true", default=False)
    p.add_argument("--hear_tasks_dir", default="hear_tasks")
    p.add_argument("--hear_scores_dir", default="",
                   help="heareval-layout scores dir (default <work_dir>/hear_scores)")
    p.add_argument("--probe_hidden", type=lambda s: tuple(
        int(x) for x in s.split(",") if x), default=(1024,))
    p.add_argument("--probe_iters", type=int, default=500)
    p.add_argument("--extra_pretrain_args", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args(argv)

    os.chdir(args.root)
    args.work_dir = os.path.abspath(args.work_dir)
    os.makedirs(args.work_dir, exist_ok=True)
    if not args.hear_scores_dir:
        args.hear_scores_dir = os.path.join(args.work_dir, "hear_scores")
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(stages) - set(ALL_STAGES)
    if unknown:
        raise SystemExit(f"unknown stages {unknown}; pick from {ALL_STAGES}")

    import time as _time

    ckpt = args.ckpt
    results = {}
    timings = {}

    def _timed(name, fn):
        t0 = _time.time()
        out = fn()
        timings[name] = round(_time.time() - t0, 1)
        print(f"[timing] {name}: {timings[name]}s")
        return out

    if "convert" in stages:
        _timed("convert", lambda: stage_convert(args))
    if "pretrain" in stages:
        ckpt = _timed("pretrain", lambda: stage_pretrain(args))
    if "probe" in stages:
        if not ckpt:
            raise SystemExit("probe stage needs --ckpt (or run pretrain)")
        results["linear"] = _timed("probe", lambda: stage_probe(args, ckpt))
    if "hear" in stages:
        if not ckpt:
            raise SystemExit("hear stage needs --ckpt (or run pretrain)")
        _timed("hear", lambda: stage_hear(args, ckpt))
    if "aggregate" in stages:
        results["hear"] = _timed("aggregate", lambda: stage_aggregate(args))
    results["timings_s"] = timings
    print(f"[done] artifacts in {args.work_dir}")
    return results


if __name__ == "__main__":
    main()
