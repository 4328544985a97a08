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
