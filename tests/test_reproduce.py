"""The packaged quality-reproduction chain (tools/reproduce.py; VERDICT r2
#3) composes end to end on a fabricated tree: wav->lms conversion, main.py
pretrain, linear.py probe, HEAR scene-embedding probes for all 18 tasks, and
the results.json aggregation with the reference's grouping schema
(/root/reference/hear/extract_results.py:12-90)."""
import csv
import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from hear.extract_results import TASKS

ALL_TASKS = [t for group in TASKS.values() for t in group]


def _write_wav(path, rng, seconds=1.0, sr=16000):
    wav = (rng.standard_normal(int(sr * seconds)) * 0.05).astype(np.float32)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


def fabricate_tree(root, n_dev=10, n_eval=4, seed=0):
    rng = np.random.default_rng(seed)
    gt = os.path.join(root, "data/FSD50K/FSD50K.ground_truth")
    dev = os.path.join(root, "data/FSD50K/FSD50K.dev_audio")
    ev = os.path.join(root, "data/FSD50K/FSD50K.eval_audio")
    for d in (gt, dev, ev):
        os.makedirs(d, exist_ok=True)
    with open(os.path.join(gt, "vocabulary.csv"), "w") as f:
        w = csv.writer(f)
        w.writerow(["index", "display", "mids"])
        for i in range(3):
            w.writerow([i, f"c{i}", f"/m/{i}"])
    dev_rows, eval_rows = [], []
    for i in range(n_dev):
        _write_wav(os.path.join(dev, f"d{i}.wav"), rng)
        split = "val" if i % 5 == 4 else "train"
        dev_rows.append([f"d{i}", f"c{i % 3}", f"/m/{i % 3}", split])
    for i in range(n_eval):
        _write_wav(os.path.join(ev, f"e{i}.wav"), rng)
        eval_rows.append([f"e{i}", f"c{i % 3}", f"/m/{i % 3}"])
    with open(os.path.join(gt, "dev.csv"), "w") as f:
        csv.writer(f).writerows(dev_rows)
    with open(os.path.join(gt, "eval.csv"), "w") as f:
        csv.writer(f).writerows(eval_rows)

    # 18 HEAR tasks, internal-probe layout; identical clip counts/lengths so
    # the scene-embedding jit compiles once per split shape
    for task in ALL_TASKS:
        tdir = os.path.join(root, "hear_tasks", task)
        labels = {"train": {}, "test": {}}
        for split, n in (("train", 6), ("test", 3)):
            os.makedirs(os.path.join(tdir, split), exist_ok=True)
            for i in range(n):
                fname = f"{split}{i}.wav"
                _write_wav(os.path.join(tdir, split, fname), rng, seconds=1.0)
                labels[split][fname] = f"class{i % 2}"
        with open(os.path.join(tdir, "labels.json"), "w") as f:
            json.dump(labels, f)
    return root


def test_full_chain_composes(tmp_path):
    from tools import reproduce

    root = fabricate_tree(str(tmp_path))
    cwd = os.getcwd()
    try:
        results = reproduce.main([
            "--root", root, "--work_dir", os.path.join(root, "out"),
            "--model_type", "audiontt", "--epochs", "1", "--batch_size", "8",
            "--epoch_save_f", "1", "--name", "smoke", "--no_eval",
            "--probe_hidden", "", "--probe_iters", "20",
            "--extra_pretrain_args",
            "--projector_hidden_dim", "64", "--projector_out_dim", "16",
            "--mixup_n_memory", "8", "--num_workers", "0",
        ])
    finally:
        os.chdir(cwd)

    # stage artifacts exist
    assert os.path.isfile(os.path.join(
        root, "data/FSD50K_lms/FSD50K.dev_audio/d0.npy"))
    lms = np.load(os.path.join(root, "data/FSD50K_lms/FSD50K.dev_audio/d0.npy"))
    assert lms.shape[0] == 64 and np.isfinite(lms).all()

    # linear probe ran and produced a finite score
    lin = results["linear"]
    assert np.isfinite(lin["score_all"])
    with open(os.path.join(root, "out/linear_scores.json")) as f:
        assert "score_all" in json.load(f)

    # aggregation: the reference's 18-task schema — every group, every task,
    # per-group AVERAGE
    with open(os.path.join(root, "out/results.json")) as f:
        agg = json.load(f)
    assert list(agg) == ["audiontt_smoke"]
    model_scores = agg["audiontt_smoke"]
    for group, tasks in TASKS.items():
        assert group in model_scores
        for task in tasks:
            assert task in model_scores[group], (group, task)
            assert 0.0 <= model_scores[group][task] <= 1.0
        assert model_scores[group]["AVERAGE"] == pytest.approx(
            np.mean([model_scores[group][t] for t in tasks]))


def test_dino_method_chain(tmp_path):
    """--method dino routes the pretrain stage through main_pretrain.py and
    the downstream probe/HEAR stages consume the legacy checkpoint via the
    encoder-graft loader (r5)."""
    from tools import reproduce

    root = fabricate_tree(str(tmp_path), seed=3)
    cwd = os.getcwd()
    try:
        results = reproduce.main([
            "--root", root, "--work_dir", os.path.join(root, "out"),
            "--model_type", "audiontt", "--method", "dino",
            "--epochs", "1", "--batch_size", "8",
            "--name", "dsmoke", "--no_eval",
            "--probe_hidden", "", "--probe_iters", "20",
            "--stages", "convert,pretrain,probe",
            "--extra_pretrain_args",
            "--dino_out_dim", "16", "--teacher_temp", "0.04",
            "--mixup_n_memory", "8", "--num_workers", "0",
        ])
    finally:
        os.chdir(cwd)
    assert np.isfinite(results["linear"]["score_all"])
