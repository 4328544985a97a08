"""Offline tool tests: HEAR results aggregation, wav->lms converter,
wav resampler."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


class TestExtractResults:
    def test_aggregation(self, tmp_path):
        from hear.extract_results import extract_all

        base = tmp_path / "embeddings"
        model_dir = base / "mymodel_100" / "sampling0"
        for task, score in [("esc50-v2.0.0-full", 0.78), ("tfds_gtzan-1.0.0-full", 0.81)]:
            d = model_dir / task
            d.mkdir(parents=True)
            with open(d / "test.predicted-scores.json", "w") as f:
                json.dump({"test": {"test_score": score}}, f)
        out = tmp_path / "results.json"
        scores = extract_all(str(base), str(out))
        assert out.exists()
        m = scores["mymodel_100"]
        assert m["environmental"]["esc50-v2.0.0-full"] == 0.78
        assert m["music"]["tfds_gtzan-1.0.0-full"] == 0.81
        assert m["environmental"]["AVERAGE"] == 0.78

    def test_aggregated_scores_format(self, tmp_path):
        from hear.extract_results import extract_task_score

        d = tmp_path / "m" / "s" / "esc50-v2.0.0-full"
        d.mkdir(parents=True)
        with open(d / "test.predicted-scores.json", "w") as f:
            json.dump({"aggregated_scores": {"test_score_mean": 0.5}}, f)
        assert extract_task_score(str(tmp_path / "m"), "esc50-v2.0.0-full") == 0.5


class TestWavToLms:
    def test_convert_directory(self, tmp_path, monkeypatch):
        from scipy.io import wavfile

        import wav_to_lms

        in_dir = tmp_path / "wavs"
        in_dir.mkdir()
        rng = np.random.default_rng(0)
        for i, sec in enumerate([1.0, 2.5]):
            wav = (rng.standard_normal(int(16000 * sec)) * 0.1 * 32767).astype(np.int16)
            wavfile.write(str(in_dir / f"c{i}.wav"), 16000, wav)
        out_dir = tmp_path / "lms"
        wav_to_lms.main([
            "--in_dir", str(in_dir), "--out_dir", str(out_dir),
            "--batch_size", "2", "--workers", "2",
        ])
        a = np.load(out_dir / "c0.npy")
        b = np.load(out_dir / "c1.npy")
        assert a.shape == (64, 101)   # 1 s -> 101 frames
        assert b.shape == (64, 251)   # 2.5 s -> 251 frames
        assert np.isfinite(a).all() and np.isfinite(b).all()

    def test_matches_frontend(self, tmp_path):
        """Converted npy == log_mel_spectrogram of the same wav."""
        from scipy.io import wavfile

        import jax

        import wav_to_lms
        from ssl_audio_tpu.ops.mel import MelSpec, log_mel_spectrogram

        rng = np.random.default_rng(1)
        wav_f = (rng.standard_normal(16000) * 0.1)
        wav_i = (np.clip(wav_f, -1, 1) * 32767).astype(np.int16)
        in_dir = tmp_path / "w"
        in_dir.mkdir()
        wavfile.write(str(in_dir / "x.wav"), 16000, wav_i)
        out_dir = tmp_path / "o"
        wav_to_lms.main(["--in_dir", str(in_dir), "--out_dir", str(out_dir)])
        got = np.load(out_dir / "x.npy")
        import jax.numpy as jnp

        expect = np.asarray(
            log_mel_spectrogram(jnp.asarray((wav_i / 32768.0).astype(np.float32))[None], MelSpec())
        )[0]
        np.testing.assert_allclose(got, expect[:, : got.shape[1]], atol=1e-4)


class TestResampleWav:
    def test_resample_one(self, tmp_path):
        from scipy.io import wavfile

        from hear.resample_wav import resample_one

        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(44100) * 0.1 * 32767).astype(np.int16)
        src = tmp_path / "a.wav"
        wavfile.write(str(src), 44100, wav)
        dst = tmp_path / "out" / "a.wav"
        resample_one((str(src), str(dst), 16000))
        sr, data = wavfile.read(str(dst))
        assert sr == 16000
        assert abs(len(data) - 16000) <= 2
