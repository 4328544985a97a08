"""End-to-end smoke tests: synthetic dataset through the Trainer, checkpoint
save/resume, and the CLI entry (invoked in-process)."""
import os

import jax
import numpy as np
import pytest

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.data.datasets import SyntheticLMS, calculate_norm_stats
from ssl_audio_tpu.data.pipeline import DataLoader
from ssl_audio_tpu.train.loop import Trainer
from ssl_audio_tpu.utils import checkpoint as ckpt_lib


def tiny_cfg(**kw):
    base = dict(
        dataset="synthetic",
        model_type="audiontt",
        batch_size=8,
        epochs=1,
        synthetic_steps_per_epoch=3,
        projector_hidden_dim=64,
        projector_out_dim=16,
        mixup_n_memory=16,
        num_workers=2,
        no_eval=True,
    )
    base.update(kw)
    return default_config(**base)


class TestDataLoader:
    def test_batches_and_sharding(self):
        cfg = tiny_cfg(synthetic_steps_per_epoch=4)
        ds = SyntheticLMS(cfg, length=35)
        dl = DataLoader(ds, batch_size=8, num_workers=2, seed=0)
        batches = list(dl)
        assert len(batches) == 4  # drop_last
        x, y = batches[0]
        assert x.shape == (8, 1, 64, 96) and y.shape == (8, 10)

        # process sharding: per-batch contiguous — concatenating the two
        # process shards in order reproduces the single-process batch rows
        # exactly (multi-process runs are bit-comparable to single-process)
        dl_g = DataLoader(ds, batch_size=8, shuffle=False)
        dl0 = DataLoader(ds, batch_size=4, shuffle=False, process_index=0, process_count=2)
        dl1 = DataLoader(ds, batch_size=4, shuffle=False, process_index=1, process_count=2)
        assert len(dl0) == len(dl1) == len(dl_g) == 4
        for (xg, yg), (x0, y0), (x1, y1) in zip(dl_g, dl0, dl1):
            np.testing.assert_array_equal(xg, np.concatenate([x0, x1]))
            np.testing.assert_array_equal(yg, np.concatenate([y0, y1]))

    def test_epoch_reshuffle(self):
        cfg = tiny_cfg()
        ds = SyntheticLMS(cfg, length=64)
        dl = DataLoader(ds, batch_size=8, seed=3)
        dl.set_epoch(1)
        i1 = dl._indices().copy()
        dl.set_epoch(2)
        i2 = dl._indices()
        assert not np.array_equal(i1, i2)

    def test_norm_stats(self):
        cfg = tiny_cfg()
        ds = SyntheticLMS(cfg, length=100)
        mean, std = calculate_norm_stats(ds, n_norm_calc=50)
        assert np.isfinite(mean) and std > 0


class TestTrainer:
    def test_one_epoch_synthetic(self):
        cfg = tiny_cfg()
        tr = Trainer(cfg)
        loss = tr.train_one_epoch(1)
        assert np.isfinite(loss) and loss > 0
        assert int(tr.state.step) == 3

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = tiny_cfg()
        tr = Trainer(cfg)
        tr.train_one_epoch(1)
        path = os.path.join(str(tmp_path), "ckpt")
        ckpt_lib.save_checkpoint(path, jax.device_get(tr.state), epoch=2)

        tr2 = Trainer(cfg)
        restored, next_epoch = ckpt_lib.load_checkpoint(path, jax.device_get(tr2.state))
        assert next_epoch == 2
        a = jax.tree.leaves(tr.state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed state trains further
        tr2.state = tr2._replicate(restored)
        loss = tr2.train_one_epoch(2)
        assert np.isfinite(loss)

    def test_nan_at_unsampled_step_aborts(self):
        """Every-step NaN detection (reference main.py:128-130): a NaN
        injected at step 2 — NOT a multiple-of-50 sync point — must still
        abort, because the carried device-side finite-flag is folded every
        step and fetched at epoch end."""
        cfg = tiny_cfg(synthetic_steps_per_epoch=4)
        tr = Trainer(cfg)
        orig = tr.train_step
        calls = {"n": 0}

        def poisoned(state, batch, key, mask_ratio, monitor, **kw):
            calls["n"] += 1
            if calls["n"] == 3:  # 0-indexed step 2: between sync points
                batch = batch * np.float32(np.nan)
            return orig(state, batch, key, mask_ratio, monitor, **kw)

        tr.train_step = poisoned
        with pytest.raises(SystemExit):
            tr.train_one_epoch(1)
        assert calls["n"] == 4  # NaN detected at the epoch-end fetch

    def test_byol_trainer(self):
        cfg = tiny_cfg(stop_gradient=True, predictor=True)
        tr = Trainer(cfg, byol=True)
        loss = tr.train_one_epoch(1)
        assert np.isfinite(loss)
        assert tr.state.target_params is not None


class TestCLI:
    def test_main_entry(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import main as main_mod

        main_mod.main([
            "--dataset", "synthetic", "--model_type", "audiontt",
            "--epochs", "1", "--batch_size", "8",
            "--synthetic_steps_per_epoch", "2", "--no_eval",
            "--projector_hidden_dim", "64", "--projector_out_dim", "16",
            "--epoch_save_f", "1",
        ])
        # a checkpoint must have been produced
        results = list((tmp_path / "results" / "synthetic").iterdir())
        assert len(results) == 1
        assert any("model_1" in str(p) for p in results[0].iterdir())

    def test_byol_entry(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import main_bt_byol as byol_mod

        byol_mod.main([
            "--dataset", "synthetic", "--model_type", "audiontt",
            "--epochs", "1", "--batch_size", "8",
            "--synthetic_steps_per_epoch", "2", "--no_eval",
            "--projector_hidden_dim", "64", "--projector_out_dim", "16",
            "--stop_gradient", "--predictor",
        ])


class TestDeviceFrontend:
    def test_wav_mode_end_to_end(self):
        """synthetic_wav: raw 10-s waveforms enter the jitted step; mel +
        random crop + normalize + augment run on device."""
        cfg = tiny_cfg(dataset="synthetic_wav", synthetic_steps_per_epoch=2)
        tr = Trainer(cfg)
        loss = tr.train_one_epoch(1)
        assert np.isfinite(loss) and loss > 0
        assert int(tr.state.step) == 2


class TestYamlConfig:
    def test_yaml_defaults_and_cli_override(self, tmp_path):
        from ssl_audio_tpu.config import config_from_args

        cfgfile = tmp_path / "exp.yaml"
        cfgfile.write_text(
            "model_type: vit_tiny\n"
            "optimizer_section:\n"
            "  lmbda: 0.01\n"
            "  batch_size: 64\n"
            "epochs: 7\n"
        )
        cfg = config_from_args(["--config", str(cfgfile)])
        assert cfg.model_type == "vit_tiny" and cfg.epochs == 7
        assert cfg.lmbda == 0.01 and cfg.batch_size == 64
        # explicit CLI flag beats yaml
        cfg2 = config_from_args(["--config", str(cfgfile), "--epochs", "3"])
        assert cfg2.epochs == 3 and cfg2.batch_size == 64

    def test_negated_cli_flag_beats_yaml(self, tmp_path):
        """Negated flags must register as explicit under their DEST name:
        --no_pool_reorder against a yaml `pool_reorder: true` keeps the CLI
        negation (ADVICE r3 — previously the yaml silently won)."""
        from ssl_audio_tpu.config import config_from_args

        cfgfile = tmp_path / "exp.yaml"
        cfgfile.write_text(
            "pool_reorder: true\nfused_conv: true\nmixup: true\n")
        cfg = config_from_args(["--config", str(cfgfile)])
        assert cfg.pool_reorder is True and cfg.fused_conv is True
        cfg2 = config_from_args(["--config", str(cfgfile),
                                 "--no_pool_reorder", "--no_fused_conv",
                                 "--no_mixup"])
        assert cfg2.pool_reorder is False
        assert cfg2.fused_conv is False
        assert cfg2.mixup is False

    def test_reference_legacy_yaml_loads_unmodified(self):
        """The REFERENCE's own legacy config files (old/configs/pretrain/)
        load directly: nested sections flattened at any depth, legacy key
        names (lambd/base_lr/batch_size_per_gpu/save_epoch_it/weight_decay)
        aliased to the active-tree flags."""
        import os

        from ssl_audio_tpu.config import config_from_args

        path = "/root/reference/old/configs/pretrain/barlow.yaml"
        if not os.path.exists(path):
            import pytest

            pytest.skip("reference tree not mounted")
        cfg = config_from_args(["--config", path, "--model_type", "audiontt"])
        # data.preprocess section (exact-name keys)
        assert cfg.n_fft == 1024 and cfg.hop_length == 160
        assert cfg.n_mels == 64 and cfg.f_min == 60 and cfg.f_max == 7800
        assert cfg.unit_sec == 0.95
        # aliased keys
        assert cfg.lmbda == 5.0e-3            # model.lambd
        assert cfg.lr == 1.0e-4               # optimizer.base_lr
        assert cfg.batch_size == 256          # optimizer.batch_size_per_gpu
        assert cfg.epoch_save_f == 10         # checkpoint.save_epoch_it
        assert cfg.wd == 0.04                 # optimizer.weight_decay
        # plain keys from nested sections
        assert cfg.epochs == 40 and cfg.seed == 32 and cfg.use_fp16 is False
        assert cfg.mask_ratio == 0.75
        # CLI still overrides
        cfg2 = config_from_args(["--config", path, "--model_type", "audiontt",
                                 "--batch_size", "16"])
        assert cfg2.batch_size == 16


class TestDeterminism:
    def test_same_seed_same_losses(self):
        """Two Trainers with identical config+seed produce identical losses."""
        cfg = tiny_cfg(seed=42)
        l1 = Trainer(cfg).train_one_epoch(1)
        l2 = Trainer(cfg).train_one_epoch(1)
        assert l1 == l2

    def test_different_seed_differs(self):
        l1 = Trainer(tiny_cfg(seed=1)).train_one_epoch(1)
        l2 = Trainer(tiny_cfg(seed=2)).train_one_epoch(1)
        assert l1 != l2


class TestDeterministicResume:
    """SURVEY.md §5 / VERDICT r2 #4: a (train 2, save, resume, train 2) run
    must be bit-identical to an uninterrupted 4-epoch run — the checkpoint
    carries the Trainer's jax key stream and host mask-ratio generator."""

    def _run(self, epochs, ckpt_dir=None, resume=None, seed=5):
        cfg = tiny_cfg(epochs=epochs, seed=seed, num_workers=0,
                       epoch_save_f=2, mask=True, random_mask_ratio=True)
        tr = Trainer(cfg)
        losses = []
        orig = tr.train_one_epoch

        def recording(epoch):
            loss = orig(epoch)
            losses.append(loss)
            return loss

        tr.train_one_epoch = recording
        tr.fit(ckpt_path=ckpt_dir, resume_path=resume)
        return losses

    def test_resume_is_bit_identical(self, tmp_path):
        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        losses_full = self._run(4, ckpt_dir=a)
        assert len(losses_full) == 4
        self._run(2, ckpt_dir=b)
        losses_resumed = self._run(4, resume=os.path.join(b, "model_2"))
        assert len(losses_resumed) == 2          # epochs 3 and 4 only
        assert losses_resumed == losses_full[2:], (
            losses_resumed, losses_full)

    def test_rng_roundtrip(self):
        """encode_rng/decode_rng reproduce both generators exactly,
        including PCG64's cached-uint32 half-word."""
        key = jax.random.split(jax.random.key(7))[0]
        host = np.random.default_rng(11)
        host.random(5)
        host.integers(0, 2**16, 3, dtype=np.uint32)   # leaves a cached half
        enc = ckpt_lib.encode_rng(key, host)
        key2, host2 = ckpt_lib.decode_rng(
            jax.tree.map(np.asarray, enc))
        np.testing.assert_array_equal(
            jax.random.key_data(key), jax.random.key_data(key2))
        assert host.bit_generator.state == host2.bit_generator.state
        np.testing.assert_array_equal(host.random(4), host2.random(4))


class TestByolWavMode:
    def test_byol_with_device_frontend(self):
        cfg = tiny_cfg(dataset="synthetic_wav", stop_gradient=True, predictor=True,
                       synthetic_steps_per_epoch=2)
        tr = Trainer(cfg, byol=True)
        loss = tr.train_one_epoch(1)
        assert np.isfinite(loss)


class TestLoaderErrorPropagation:
    def test_producer_exception_reaches_consumer(self):
        """A dataset error must raise in the consuming thread, not hang."""

        class Broken:
            def __len__(self):
                return 8

            def __getitem__(self, idx):
                raise ValueError("boom")

        dl = DataLoader(Broken(), batch_size=4, num_workers=2)
        with pytest.raises(ValueError, match="boom"):
            list(dl)
