"""Smoke tests for the perf tooling (tools/mfu.py, tools/step_ablation.py,
tools/bench_legacy.py, tools/bench_hear.py) — tiny shapes, CPU backend.

These tools carry the PERF.md methodology (slope timing, DCE-proof FLOPs);
a silent interface break would invalidate future measurements."""
import runpy
import sys

import pytest


def _run(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


class TestPerfTools:
    def test_mfu_smoke(self, tmp_path, capsys):
        _run("tools/mfu.py",
             ["--models", "audiontt", "--batches", "4", "--n_steps", "2",
              "--out", str(tmp_path / "m.json")])
        out = capsys.readouterr().out
        assert '"ms_per_step"' in out and '"gflops_per_step"' in out

    def test_step_ablation_smoke(self, capsys):
        _run("tools/step_ablation.py",
             ["--model", "audiontt", "--batch", "4", "--n", "2"])
        out = capsys.readouterr().out
        assert '"step"' in out and '"grad"' in out

    def test_bench_legacy_smoke(self, capsys):
        _run("tools/bench_legacy.py",
             ["--methods", "byola", "--batch", "4", "--n", "2"])
        out = capsys.readouterr().out
        assert '"ms_per_step"' in out

    def test_bench_hear_smoke(self, capsys):
        _run("tools/bench_hear.py",
             ["--module", "conv", "--model", "audiontt", "--n_clips", "2",
              "--seconds", "1", "--reps", "1"])
        out = capsys.readouterr().out
        assert '"clips_per_sec"' in out

    def test_bench_hear_device_only_smoke(self, capsys):
        """--device_only times the timestamp pipeline with a checksum fetch;
        --fused_conv exercises the opt-in eval kernel route."""
        _run("tools/bench_hear.py",
             ["--module", "conv", "--model", "audiontt", "--n_clips", "2",
              "--seconds", "1", "--reps", "1", "--device_only",
              "--fused_conv"])
        out = capsys.readouterr().out
        assert '"timestamp_device"' in out

    # ---- r5 tools -----------------------------------------------------

    def test_gemm_probe_interleave_smoke(self, tmp_path, capsys):
        """--interleave defers selected probes, compiles all, then times in
        round-robin — the drift-proof mode the r5 bisect used."""
        _run("tools/gemm_probe.py",
             ["--n", "2", "--M", "84", "--reps", "1", "--interleave",
              "--only", "fc1 + bias,block fwd+bwd",
              "--out", str(tmp_path / "g.json")])
        out = capsys.readouterr().out
        assert "fc1 + bias+gelu" in out and "block fwd+bwd" in out
        import json
        got = json.loads((tmp_path / "g.json").read_text())
        assert set(got) == {"fc1 + bias+gelu", "block fwd+bwd"}

    def test_dino_diagnose_smoke(self, tmp_path, capsys):
        """Collapse diagnostic: rows carry the uniform-fixed-point signals
        (entropies, logit/feature batch-std, center norm)."""
        _run("tools/dino_diagnose.py",
             ["--epochs", "1", "--steps", "2", "--batch", "4",
              "--out_dim", "16", "--out", str(tmp_path / "d.json")])
        out = capsys.readouterr().out
        assert '"teacher_entropy"' in out and '"ln_out_dim"' in out

    def test_scene_pad_probe_smoke(self, tmp_path, capsys):
        _run("tools/scene_pad_probe.py",
             ["--batch", "2", "--n", "2", "--reps", "1",
              "--out", str(tmp_path / "s.json")])
        out = capsys.readouterr().out
        assert "pad-to-1008" in out

    def test_dino_torch_crosscheck_smoke(self, tmp_path, capsys):
        """The reference's own DINOLoss/DINOHead import and train a step —
        guards the torch_shims old-tree import path."""
        _run("tools/dino_torch_crosscheck.py",
             ["--epochs", "1", "--steps", "2", "--batch", "4",
              "--out_dim", "16", "--embed_dim", "32",
              "--out", str(tmp_path / "t.json")])
        out = capsys.readouterr().out
        assert '"teacher_entropy"' in out

    def test_bench_legacy_config_hash_and_out(self, tmp_path, capsys):
        _run("tools/bench_legacy.py",
             ["--methods", "byola", "--batch", "4", "--n", "2",
              "--out", str(tmp_path / "b.json")])
        import json
        rows = json.loads((tmp_path / "b.json").read_text())
        assert rows and rows[0]["config_hash"]

    def test_prove_learning_stale_artifact_warning(self, tmp_path, capsys):
        """Overwriting a proof recorded under a different config warns
        (VERDICT r4 #7 — how the stale DINO proof slipped through)."""
        out_path = tmp_path / "p.json"
        # batch 8: the barlow Trainer shards the batch over the conftest's
        # 8-device mesh
        args = ["--dataset", "synthetic_multicue", "--model_type", "audiontt",
                "--method", "barlow", "--epochs", "1", "--batch_size", "8",
                "--synthetic_steps_per_epoch", "2", "--num_workers", "0",
                "--out", str(out_path)]
        _run("tools/prove_learning.py", args)
        first = capsys.readouterr().out
        assert "WARNING" not in first
        import json
        rec = json.loads(out_path.read_text())
        assert rec["config_hash"] and rec["resolved_config"]["batch_size"] == 8
        _run("tools/prove_learning.py", args + ["--lmbda", "0.1"])
        second = capsys.readouterr().out
        assert "WARNING: overwriting" in second
