"""Round-3 review fixes (VERDICT r2 #7/#8, ADVICE r2):

* AudioSet lms eval split (`test=True`) — the AudioSet-20k probe protocol
  scores on eval segments (reference old/data_manager/audioset_lms.py:72-78,
  old/evaluate/linear.py), never the training set.
* mixup ring-buffer guard: batch_size > mixup_n_memory must raise instead of
  silently corrupting the bank (reference augmentations.py:101-115 appends
  per sample and can never alias).
* token-drop static len_keep: --random_mask_ratio must fall back to the
  traced key-bias path (each fresh continuous ratio would otherwise mint a
  distinct jit cache entry), and quantization must use the full-precision
  python ratio on every path.
"""
import os

import numpy as np
import pytest

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.data import datasets as D


def fabricate_audioset_lms(root, n_train=6, n_eval=3, n_mels=64, T=101, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "data", "audioset_lms")
    os.makedirs(base, exist_ok=True)
    classes = [("/m/0", "0"), ("/m/1", "1"), ("/m/2", "2")]
    with open(os.path.join(base, "class_labels_indices.csv"), "w") as f:
        f.write("index,mids,display_name\n")
        for mid, idx in classes:
            f.write(f"{idx},{mid},name{idx}\n")

    def write_split(csv_name, ident, names):
        os.makedirs(os.path.join(base, ident), exist_ok=True)
        with open(os.path.join(base, csv_name), "w") as f:
            for i, name in enumerate(names):
                labels = classes[i % 3][0]
                f.write(f"{name},{labels},{ident}\n")
                np.save(os.path.join(base, ident, f"{name}.npy"),
                        rng.standard_normal((n_mels, T)).astype(np.float32))

    write_split("unbalanced_train_segments-downloaded.csv",
                "unbalanced_train_segments", [f"u{i}" for i in range(n_train)])
    write_split("eval_segments-downloaded.csv", "eval_segments",
                [f"e{i}" for i in range(n_eval)])
    return root


@pytest.fixture(scope="module")
def lms_tree(tmp_path_factory):
    return fabricate_audioset_lms(str(tmp_path_factory.mktemp("aslms")))


class TestAudioSetEvalSplit:
    def test_train_split_reads_unbalanced(self, lms_tree):
        ds = D.AudioSet(default_config(), data_dir=os.path.join(lms_tree, "data"))
        assert len(ds) == 6
        assert ds.audio_fnames == [f"u{i}" for i in range(6)]
        lms, y = ds[0]
        assert lms.shape[0] == 1 and y.shape == (3,)

    def test_eval_split_reads_eval_segments(self, lms_tree):
        ds = D.AudioSet(default_config(), data_dir=os.path.join(lms_tree, "data"),
                        test=True)
        assert len(ds) == 3
        assert ds.audio_fnames == ["e0", "e1", "e2"]
        lms, y = ds[0]                       # loads from eval_segments/
        assert np.isfinite(lms).all() and y.sum() == 1.0

    def test_evaluate_entry_probes_on_eval_split(self, lms_tree, monkeypatch):
        """evaluate.py --dataset audioset composes train=train-segments,
        val=eval-segments end to end (VERDICT r2 #7)."""
        import evaluate

        monkeypatch.chdir(lms_tree)
        score = evaluate.main([
            "--dataset", "audioset", "--model_type", "audiontt",
            "--batch_size", "3", "--num_workers", "0",
            "--eval_epochs", "1",
        ])
        assert np.isfinite(score)


class TestMixupBankGuard:
    def test_batch_larger_than_bank_raises(self):
        from ssl_audio_tpu.augment.transforms import init_augment_state

        cfg = default_config(batch_size=128, mixup_n_memory=64)
        with pytest.raises(ValueError, match="mixup_n_memory"):
            init_augment_state(cfg)

    def test_batch_equal_bank_ok(self):
        from ssl_audio_tpu.augment.transforms import init_augment_state

        cfg = default_config(batch_size=64, mixup_n_memory=64)
        state = init_augment_state(cfg)
        assert state.mixup.bank.shape[0] == 64

    def test_no_mixup_skips_guard(self):
        from ssl_audio_tpu.augment.transforms import init_augment_state

        cfg = default_config(batch_size=128, mixup_n_memory=64, mixup=False)
        assert init_augment_state(cfg).mixup is None


class _FakeTrainer:
    """Duck-typed receiver for Trainer._static_len_keep."""

    def __init__(self, cfg, token_L):
        self.cfg = cfg
        self._token_L = token_L


class TestStaticLenKeep:
    def lk(self, ratio, token_L=24, **cfg_kw):
        from ssl_audio_tpu.train.loop import Trainer

        t = _FakeTrainer(default_config(**cfg_kw), token_L)
        return Trainer._static_len_keep(t, ratio)

    def test_fixed_ratio_quantizes(self):
        assert self.lk(0.3) == int(np.floor(24 * 0.7))

    def test_random_mask_ratio_falls_back_to_traced(self):
        # ADVICE r2 (medium): a fresh continuous ratio per step must NOT
        # become a fresh static compile
        assert self.lk(0.2137, random_mask_ratio=True) is None

    def test_zero_ratio_and_no_token_L(self):
        assert self.lk(0.0) is None
        from ssl_audio_tpu.train.loop import Trainer

        t = _FakeTrainer(default_config(), None)
        assert Trainer._static_len_keep(t, 0.3) is None

    def test_quantization_matches_reference_formula(self):
        # ADVICE r2 (low): both the single-step and multi-dispatch paths now
        # quantize through _static_len_keep from the original python float,
        # matching the reference's float64 int(L*(1-r)) (mae.py:330)
        for r in (0.05, 0.1, 0.25, 0.3, 0.75):
            assert self.lk(r) == int(np.floor(24 * (1.0 - r)))
