"""Tests for the legacy-tree capabilities (SURVEY §2.2): SpecAugment,
supervised finetune/linear trainers, AudioSet stats, mask_conv, BYOL-A loss,
plotting."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_audio_tpu.augment import spec_augment
from ssl_audio_tpu.augment.mask_conv import mask_conv
from ssl_audio_tpu.eval.stats import calculate_stats, d_prime, mean_average_precision
from ssl_audio_tpu.objectives.byol import byol_loss_fn, byol_symmetric_loss
from ssl_audio_tpu.utils.plotting import read_loss_csv


class TestSpecAugment:
    def test_freq_mask_zeroes_band(self, rng):
        x = jnp.ones((4, 1, 64, 96))
        out = np.asarray(spec_augment.freq_mask(jax.random.key(0), x, max_width=16))
        # each sample: some rows fully zero or none (width could be 0)
        for b in range(4):
            rows = out[b, 0].sum(axis=1)
            zeroed = (rows == 0).sum()
            assert 0 <= zeroed <= 16
        assert (np.asarray(out) <= 1).all()

    def test_time_mask_shape(self, rng):
        x = jnp.ones((4, 1, 64, 96))
        out = spec_augment.time_mask(jax.random.key(1), x, max_width=20)
        assert out.shape == x.shape

    def test_mixup_batch_labels(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 1, 8, 8)).astype(np.float32))
        y = jnp.asarray(np.eye(8, dtype=np.float32))
        xm, ym = spec_augment.mixup_batch(jax.random.key(0), x, y, 0.4)
        np.testing.assert_allclose(np.asarray(ym).sum(axis=1), 1.0, atol=1e-6)


class TestMaskConv:
    def test_mask_ratio_and_zeroing(self, rng):
        x = jnp.ones((2, 1, 64, 96))
        out, mask = mask_conv(jax.random.key(0), x, 0.5, (16, 16))
        assert mask.shape == (2, 24)
        np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), 12)
        # masked patches are fully zero
        patches = np.asarray(out).reshape(2, 1, 4, 16, 6, 16)
        for b in range(2):
            m = np.asarray(mask[b]).reshape(4, 6)
            for i in range(4):
                for j in range(6):
                    if m[i, j]:
                        assert (patches[b, 0, i, :, j, :] == 0).all()
                    else:
                        assert (patches[b, 0, i, :, j, :] == 1).all()


class TestStats:
    def test_perfect_scores(self):
        target = np.eye(4, dtype=np.float32)[np.arange(20) % 4]
        output = target * 0.9 + 0.05
        stats = calculate_stats(output, target)
        assert len(stats) == 4
        for s in stats:
            np.testing.assert_allclose(s["AP"], 1.0)
            np.testing.assert_allclose(s["auc"], 1.0)
        assert mean_average_precision(output, target) == 1.0

    def test_d_prime_chance(self):
        np.testing.assert_allclose(d_prime(0.5), 0.0, atol=1e-9)


class TestByolLoss:
    def test_identical_vectors_zero(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(byol_loss_fn(x, x)), 0.0, atol=1e-6)

    def test_matches_torch_reference_formula(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.standard_normal((8, 16)).astype(np.float32)
        y = rng.standard_normal((8, 16)).astype(np.float32)
        ours = np.asarray(byol_loss_fn(jnp.asarray(x), jnp.asarray(y)))
        # reference old/byola/byol_pytorch.py:47-50
        xt = F.normalize(torch.from_numpy(x), dim=-1, p=2)
        yt = F.normalize(torch.from_numpy(y), dim=-1, p=2)
        ref = (2 - 2 * (xt * yt).sum(dim=-1)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_symmetric(self, rng):
        a = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
        l1 = float(byol_symmetric_loss(a, b, b, a))
        assert np.isfinite(l1) and l1 > 0


class TestFinetune:
    def test_linear_and_finetune_heads(self, rng):
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.data.datasets import SyntheticLMS
        from ssl_audio_tpu.data.pipeline import DataLoader
        from ssl_audio_tpu.eval.finetune import train_classifier
        from ssl_audio_tpu.train.state import init_train_state

        cfg = default_config(model_type="audiontt", batch_size=16,
                             projector_hidden_dim=32, projector_out_dim=8)
        mods, state = init_train_state(cfg, jax.random.key(0))
        ds = SyntheticLMS(cfg, length=64, n_classes=4)
        dl = DataLoader(ds, batch_size=16, shuffle=True, drop_last=False, num_workers=2)
        dl_val = DataLoader(ds, batch_size=16, shuffle=False, drop_last=False, num_workers=2)
        params = jax.device_get(state.params)
        bs = jax.device_get(state.batch_stats)
        trained, score = train_classifier(
            mods, params, bs, dl, dl_val, n_classes=4, epochs=2, mixup_alpha=0.2,
            specaug=True,
        )
        assert np.isfinite(score) and score > 0.3
        assert "head" in trained and "encoder" not in trained
        trained_ft, score_ft = train_classifier(
            mods, params, bs, dl, dl_val, n_classes=4, epochs=1, finetune=True,
            mixup_alpha=None,
        )
        assert "encoder" in trained_ft

    def test_finetune_updates_bn_stats_linear_freezes(self, rng):
        """FinetuneTrainer parity (old/evaluate/finetune.py): encoder BN
        running stats must update during finetune (train mode) and stay
        frozen during linear eval."""
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.data.datasets import SyntheticLMS
        from ssl_audio_tpu.data.pipeline import DataLoader
        from ssl_audio_tpu.eval.finetune import train_classifier
        from ssl_audio_tpu.train.state import init_train_state

        cfg = default_config(model_type="audiontt", batch_size=8,
                             projector_hidden_dim=32, projector_out_dim=8)
        mods, state = init_train_state(cfg, jax.random.key(0))
        ds = SyntheticLMS(cfg, length=16, n_classes=4)
        dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=False, num_workers=0)
        dl_val = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False, num_workers=0)
        params = jax.device_get(state.params)
        bs = jax.device_get(state.batch_stats)
        bs_before = jax.tree.leaves(bs["encoder"])

        trained_ft, _ = train_classifier(
            mods, params, bs, dl, dl_val, n_classes=4, epochs=1, finetune=True,
            mixup_alpha=None,
        )
        assert "encoder_batch_stats" in trained_ft
        bs_after = jax.tree.leaves(trained_ft["encoder_batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(bs_before, bs_after)
        )
        assert changed, "finetune must update encoder BN running stats"

        trained_lin, _ = train_classifier(
            mods, params, bs, dl, dl_val, n_classes=4, epochs=1, finetune=False,
            mixup_alpha=None,
        )
        assert "encoder_batch_stats" not in trained_lin


class TestPlotting:
    def test_read_loss_csv(self, tmp_path):
        p = tmp_path / "log.csv"
        p.write_text("epoch,1,step,0,loss,5.0\nepoch,1,step,50,loss,4.0\n"
                     "epoch,2,step,100,linear_score,0.5\n")
        steps, losses = read_loss_csv(str(p))
        assert steps == [0, 50] and losses == [5.0, 4.0]
