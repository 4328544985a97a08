"""C++ npy batch loader: correctness vs the python path + throughput sanity."""
import os
import time

import numpy as np
import pytest

from ssl_audio_tpu.data.native_loader import NativeBatchReader, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++/native lib")


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lms")
    rng = np.random.default_rng(0)
    paths = []
    for i, T in enumerate([160, 96, 50, 301, 96]):
        arr = rng.standard_normal((64, T)).astype(np.float32)
        p = os.path.join(str(d), f"clip{i}.npy")
        np.save(p, arr)
        paths.append(p)
    # one f8 file
    p8 = os.path.join(str(d), "clip_f8.npy")
    np.save(p8, rng.standard_normal((64, 120)).astype(np.float64))
    paths.append(p8)
    return paths


class TestNativeLoader:
    def test_batch_correctness(self, npy_dir):
        mean, std = -4.95, 5.855
        reader = NativeBatchReader(64, 96, mean, std, n_threads=4)
        batch = reader.read(npy_dir, seed=7)
        assert batch.shape == (6, 1, 64, 96)
        assert np.isfinite(batch).all()
        for i, p in enumerate(npy_dir):
            ref = np.load(p).astype(np.float32)
            T = ref.shape[1]
            got = batch[i, 0]
            if T <= 96:
                # no crop: values must match exactly over [0, T), padding after
                expect = (ref - mean) / std
                np.testing.assert_allclose(got[:, :T], expect[:, :T], atol=1e-5)
                np.testing.assert_allclose(
                    got[:, T:], (0.0 - mean) / std, atol=1e-5
                )
            else:
                # some contiguous 96-frame window of the normalized source
                expect = (ref - mean) / std
                found = False
                for s in range(T - 96):
                    if np.allclose(got, expect[:, s : s + 96], atol=1e-5):
                        found = True
                        break
                assert found, f"crop of {p} not found in source"

    def test_deterministic_seed(self, npy_dir):
        reader = NativeBatchReader(64, 96, 0.0, 1.0)
        a = reader.read(npy_dir, seed=3)
        b = reader.read(npy_dir, seed=3)
        c = reader.read(npy_dir, seed=4)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a[3], c[3])  # long clip gets another crop

    def test_missing_file_raises(self, npy_dir):
        reader = NativeBatchReader(64, 96, 0.0, 1.0)
        with pytest.raises(IOError):
            reader.read([npy_dir[0], "/nonexistent/x.npy"])

    def test_throughput_vs_python(self, npy_dir, tmp_path):
        """The native path should at least keep pace with numpy per-file
        loading (it usually wins big on many small files)."""
        rng = np.random.default_rng(1)
        paths = []
        for i in range(200):
            p = str(tmp_path / f"c{i}.npy")
            np.save(p, rng.standard_normal((64, 1001)).astype(np.float32))
            paths.append(p)
        reader = NativeBatchReader(64, 96, 0.0, 1.0, n_threads=8)
        reader.read(paths[:8])  # warm
        t0 = time.time()
        reader.read(paths)
        t_native = time.time() - t0

        t0 = time.time()
        for p in paths:
            arr = np.load(p)
            s = 0
            arr = (arr[:, s : s + 96] - 0.0) / 1.0
        t_python = time.time() - t0
        print(f"native {t_native*1e3:.1f}ms vs python {t_python*1e3:.1f}ms")
        assert t_native < t_python * 2.0


class TestNativePipelineIntegration:
    def test_fsd50k_native_path(self, tmp_path):
        """DataLoader uses the C++ reader for an lms FSD50K dataset and the
        batches match the python path's distribution."""
        import csv

        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.data.datasets import FSD50K
        from ssl_audio_tpu.data.pipeline import DataLoader

        rng = np.random.default_rng(0)
        gt = tmp_path / "FSD50K/FSD50K.ground_truth"
        gt.mkdir(parents=True)
        lms_dir = tmp_path / "FSD50K_lms/FSD50K.dev_audio"
        lms_dir.mkdir(parents=True)
        with open(gt / "vocabulary.csv", "w") as f:
            w = csv.writer(f)
            w.writerow(["index", "display", "mids"])
            for i in range(3):
                w.writerow([i, f"c{i}", f"/m/{i}"])
        rows = []
        for i in range(16):
            np.save(lms_dir / f"f{i}.npy", rng.standard_normal((64, 150)).astype(np.float32))
            rows.append([f"f{i}", f"c{i%3}", f"/m/{i%3}", "train"])
        with open(gt / "dev.csv", "w") as f:
            csv.writer(f).writerows(rows)

        cfg = default_config(batch_size=8)
        ds = FSD50K(cfg, split="train", norm_stats=(-4.95, 5.855), data_dir=str(tmp_path))
        assert ds.supports_native
        dl = DataLoader(ds, batch_size=8, num_workers=4, seed=0)
        assert dl._native_reader() is not None
        batches = list(dl)
        assert len(batches) == 2
        x, y = batches[0]
        assert x.shape == (8, 1, 64, 96) and y.shape == (8, 3)
        assert np.isfinite(x).all()
        # normalized stats should be near the python path's
        ref_x, _ = ds[0]
        assert abs(x.mean() - ref_x.mean()) < 0.5
