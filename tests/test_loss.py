"""Barlow Twins loss parity vs a torch re-implementation of reference
utils/loss.py, plus schedule golden values."""
import jax.numpy as jnp
import numpy as np
import torch

from ssl_audio_tpu.objectives.barlow import barlow_twins_loss, barlow_twins_pair_loss
from ssl_audio_tpu.utils import schedules


def torch_bt_pair(z1, z2, lmbda, alpha, hsic=False):
    """Reference forward_loss (loss.py:15-30), single process."""
    z1, z2 = torch.from_numpy(z1), torch.from_numpy(z2)
    bn = torch.nn.BatchNorm1d(z1.shape[1], affine=False)
    bn.train()
    c = bn(z1).T @ bn(z2)
    c = c / z1.shape[0]
    on_diag = torch.diagonal(c).add_(-1).pow_(2).sum()
    n = c.shape[0]
    off = c.flatten()[:-1].view(n - 1, n + 1)[:, 1:].flatten()
    if hsic:
        off_diag = off.add(1).pow_(2).sum()
    else:
        off_diag = off.pow_(2).sum()
    return float(alpha * on_diag + lmbda * off_diag)


class TestPairLoss:
    def test_parity_with_torch(self, rng):
        z1 = rng.standard_normal((32, 16)).astype(np.float32)
        z2 = (z1 * 0.5 + rng.standard_normal((32, 16)) * 0.5).astype(np.float32)
        ours = float(barlow_twins_pair_loss(jnp.asarray(z1), jnp.asarray(z2),
                                            lmbda=0.005, alpha=1.0))
        ref = torch_bt_pair(z1, z2, 0.005, 1.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_hsic_parity(self, rng):
        z1 = rng.standard_normal((32, 16)).astype(np.float32)
        z2 = rng.standard_normal((32, 16)).astype(np.float32)
        ours = float(barlow_twins_pair_loss(jnp.asarray(z1), jnp.asarray(z2),
                                            lmbda=0.01, alpha=2.0, HSIC=True))
        ref = torch_bt_pair(z1, z2, 0.01, 2.0, hsic=True)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_identical_views_loss_near_zero_on_diag(self, rng):
        """If z1 == z2 perfectly correlated per-dim, on-diag term ~ 0."""
        z = rng.standard_normal((64, 8)).astype(np.float32)
        loss = float(barlow_twins_pair_loss(jnp.asarray(z), jnp.asarray(z),
                                            lmbda=0.0, alpha=1.0))
        assert loss < 1e-3

    def test_multicrop_pairing(self, rng):
        zs = [jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32)) for _ in range(3)]
        t = [jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))]
        # 1 teacher, 3 students -> mean of 3 pair losses
        total = float(barlow_twins_loss(zs, t))
        pairs = [float(barlow_twins_pair_loss(t[0], z)) for z in zs]
        np.testing.assert_allclose(total, np.mean(pairs), rtol=1e-6)

    def test_two_teachers_skip_same_index(self, rng):
        zs = [jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32)) for _ in range(2)]
        ts = [jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32)) for _ in range(2)]
        total = float(barlow_twins_loss(zs, ts))
        expect = np.mean([
            float(barlow_twins_pair_loss(ts[0], zs[1])),
            float(barlow_twins_pair_loss(ts[1], zs[0])),
        ])
        np.testing.assert_allclose(total, expect, rtol=1e-6)


class TestSchedules:
    def test_adjust_lr_matches_reference_formula(self):
        """Golden values from reference utils.py:48-59."""
        epochs, niter, batch = 100, 50, 256
        f0 = schedules.adjust_learning_rate_factor(epochs, niter, batch, 0)
        assert f0 == 0.0
        f_warm_end = schedules.adjust_learning_rate_factor(epochs, niter, batch, 50)
        np.testing.assert_allclose(f_warm_end, 2.0, rtol=1e-6)  # base_lr = 256/128
        # deep into cosine: monotone decreasing
        fs = [schedules.adjust_learning_rate_factor(epochs, niter, batch, s)
              for s in [100, 2000, 5000]]
        assert fs[0] > fs[1] > fs[2] > 0

    def test_jnp_factor_matches_numpy(self):
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.train.optim import lr_factor_fn
        cfg = default_config(lr_schedule=True, epochs=100, batch_size=256)
        fn = lr_factor_fn(cfg, 50)
        for s in [0, 10, 50, 100, 2000, 4999]:
            np.testing.assert_allclose(
                float(fn(s)),
                schedules.adjust_learning_rate_factor(100, 50, 256, s),
                rtol=1e-5,
            )

    def test_cosine_scheduler_shape(self):
        sched = schedules.cosine_scheduler(1.0, 0.1, 10, 20, warmup_epochs=2)
        assert len(sched) == 200
        np.testing.assert_allclose(sched[0], 0.0, atol=1e-7)
        np.testing.assert_allclose(sched[40], 1.0, rtol=1e-3)
        np.testing.assert_allclose(sched[-1], 0.1, atol=1e-3)

    def test_sine_increase(self):
        sched = schedules.sine_scheduler_increase(0.3, 10, 20, warmup_epochs=2, warmup_value=0)
        assert len(sched) == 200
        assert (sched[:40] == 0).all()
        assert sched[-1] <= 0.3 and sched[-1] > 0.29
        assert np.all(np.diff(sched[40:]) >= 0)
