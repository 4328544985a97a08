"""AudioSetWav loader parity over a fabricated CSV + wav tree (reference
old/data_manager/audioset.py:41-212): balanced/unbalanced/eval selection,
download cap, stereo->mono, pad/crop, multi-hot labels — feeding the
on-device frontend through the Trainer."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.data.datasets import AudioSetWav


def fabricate_audioset(root, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "audioset")
    classes = [("/m/0", "0", "speech"), ("/m/1", "1", "music"),
               ("/m/2", "2", "dog")]
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "class_labels_indices.csv"), "w") as f:
        f.write("index,mid,display_name\n")
        for mid, idx, name in classes:
            f.write(f"{idx},{mid},{name}\n")

    def write_split(csv_name, ident, names, stereo=False, short=False):
        os.makedirs(os.path.join(base, ident), exist_ok=True)
        with open(os.path.join(base, csv_name), "w") as f:
            for i, name in enumerate(names):
                labels = "#".join([classes[i % 3][0], classes[(i + 1) % 3][0]])
                f.write(f"{name},{labels},{ident}\n")
                n = sr // 2 if short else sr * 2
                wav = (rng.standard_normal((n, 2) if stereo else n) * 0.1)
                wavfile.write(os.path.join(base, ident, f"{name}.wav"), sr,
                              (wav * 32767).astype(np.int16))

    write_split("unbalanced_train_segments-downloaded.csv",
                "unbalanced_train_segments", [f"u{i}" for i in range(6)])
    write_split("balanced_train_segments-downloaded.csv",
                "balanced_train_segments", [f"b{i}" for i in range(3)],
                stereo=True)
    write_split("eval_segments-downloaded.csv", "eval_segments",
                [f"e{i}" for i in range(2)], short=True)
    return base


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return fabricate_audioset(str(tmp_path_factory.mktemp("aswav")))


def cfg():
    return default_config(dataset="audioset_wav", batch_size=4,
                          projector_hidden_dim=32, projector_out_dim=8,
                          mixup_n_memory=8)


class TestSelection:
    def test_train_combines_unbalanced_then_balanced(self, tree):
        ds = AudioSetWav(cfg(), base_dir=tree)
        assert len(ds) == 9
        assert ds.audio_fnames[:6] == [f"u{i}" for i in range(6)]
        assert ds.audio_fnames[6:] == [f"b{i}" for i in range(3)]

    def test_balanced_only(self, tree):
        ds = AudioSetWav(cfg(), base_dir=tree, balanced_only=True)
        assert ds.audio_fnames == [f"b{i}" for i in range(3)]

    def test_eval_split(self, tree):
        ds = AudioSetWav(cfg(), base_dir=tree, test=True)
        assert ds.audio_fnames == ["e0", "e1"]

    def test_download_cap(self, tree):
        ds = AudioSetWav(cfg(), base_dir=tree, twohundredk_only=True, cap=4)
        assert len(ds) == 4
        assert ds.audio_fnames == ["u0", "u1", "u2", "u3"]


class TestItems:
    def test_mono_crop_and_labels(self, tree):
        c = cfg()
        ds = AudioSetWav(c, base_dir=tree)
        wav, y = ds[0]
        assert wav.shape == (int(c.unit_sec * c.sample_rate),)
        assert wav.dtype == np.float32
        assert y.shape == (3,) and y.sum() == 2.0     # two '#'-joined labels

    def test_stereo_to_mono(self, tree):
        ds = AudioSetWav(cfg(), base_dir=tree, balanced_only=True)
        wav, _ = ds[0]
        assert wav.ndim == 1 and np.isfinite(wav).all()

    def test_short_clip_zero_padded_both_ends(self, tree):
        c = cfg()
        ds = AudioSetWav(c, base_dir=tree, test=True)
        wav, _ = ds[0]
        unit = int(c.unit_sec * c.sample_rate)
        assert wav.shape == (unit,)
        pad = unit - c.sample_rate // 2
        assert (wav[: pad // 2] == 0).all()           # zero pad at the front

    def test_wrong_sample_rate_asserts(self, tree, tmp_path):
        c = cfg().replace(sample_rate=32000)
        ds = AudioSetWav(c, base_dir=tree)
        with pytest.raises(AssertionError, match="32000"):
            ds[0]


class TestTrainerIntegration:
    def test_one_epoch_through_device_frontend(self, tree, monkeypatch):
        """audioset_wav end to end: CSV tree -> raw wavs -> on-device mel +
        views -> one training step."""
        from ssl_audio_tpu.train.loop import Trainer

        monkeypatch.chdir(os.path.dirname(tree))
        c = cfg().replace(epochs=1, num_workers=0, batch_size=8)
        tr = Trainer(c, data_dir=os.path.dirname(tree))
        loss = tr.train_one_epoch(1)
        assert np.isfinite(loss) and loss > 0


class TestNativeWavLoader:
    """C++ batch decoder (native/wav_batch_loader.cc) parity with the
    Python item path (stereo->mono, int16 scaling, pad-both-ends, crop
    window membership)."""

    def test_available(self):
        from ssl_audio_tpu.data import native_loader as nl

        assert nl.native_wav_available()

    def _full_decode(self, path):
        from scipy.io import wavfile

        _sr, data = wavfile.read(path)
        data = data.astype(np.float32) / 32768.0
        if data.ndim == 2:
            data = data.mean(axis=1)
        return data

    def test_long_clip_is_contiguous_crop(self, tree):
        from ssl_audio_tpu.data.native_loader import NativeWavReader

        c = cfg()
        ds = AudioSetWav(c, base_dir=tree)
        paths, labels = ds.batch_paths(range(4))
        r = NativeWavReader(ds.unit_length, c.sample_rate, n_threads=2)
        out = r.read(paths, seed=3)
        assert out.shape == (4, ds.unit_length) and out.dtype == np.float32
        for row, path in zip(out, paths):
            full = self._full_decode(path)          # 2 s > unit: crop
            found = False
            for start in range(len(full) - ds.unit_length + 1):
                if abs(full[start] - row[0]) < 1e-7:
                    if np.allclose(full[start:start + ds.unit_length], row,
                                   atol=1e-7):
                        found = True
                        break
            assert found, f"native crop of {path} is not a window of the wav"

    def test_stereo_mono_and_pad_exact(self, tree):
        """Short eval clips pad deterministically -> bit-level comparison
        against the Python semantics; stereo balanced clips average."""
        from ssl_audio_tpu.data.native_loader import NativeWavReader

        c = cfg()
        ds = AudioSetWav(c, base_dir=tree, test=True)        # 0.5 s clips
        paths, _ = ds.batch_paths(range(2))
        r = NativeWavReader(ds.unit_length, c.sample_rate)
        out = r.read(paths, seed=0)
        for row, path in zip(out, paths):
            full = self._full_decode(path)
            adj = ds.unit_length - len(full)
            expect = np.pad(full, (adj // 2, adj - adj // 2))
            np.testing.assert_allclose(row, expect, atol=1e-7)

        ds2 = AudioSetWav(c, base_dir=tree, balanced_only=True)  # stereo
        paths2, _ = ds2.batch_paths(range(2))
        out2 = r.read(paths2, seed=0)
        assert np.isfinite(out2).all() and (np.abs(out2) > 0).any()

    def test_sample_rate_mismatch_raises(self, tree):
        from ssl_audio_tpu.data.native_loader import NativeWavReader

        c = cfg()
        ds = AudioSetWav(c, base_dir=tree)
        paths, _ = ds.batch_paths(range(2))
        r = NativeWavReader(ds.unit_length, 32000)
        with pytest.raises(IOError, match="failed on"):
            r.read(paths, seed=0)

    def test_dataloader_uses_native_path(self, tree):
        from ssl_audio_tpu.data.pipeline import DataLoader

        c = cfg()
        ds = AudioSetWav(c, base_dir=tree)
        dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
        assert dl._native_reader() is not None
        xs, ys = next(iter(dl))
        assert xs.shape == (4, ds.unit_length) and xs.dtype == np.float32
        assert ys.shape == (4, 3)
