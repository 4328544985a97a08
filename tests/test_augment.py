"""Parity and behavior tests for the on-device augmentation stack
(ssl_audio_tpu/augment) against reference semantics (augmentations.py,
utils/transforms.py), with torch as the bicubic-interpolation oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ssl_audio_tpu.augment import augmentations as A
from ssl_audio_tpu.augment.transforms import init_augment_state, make_pair_views
from ssl_audio_tpu.config import default_config


def torch_crop_resize(lms, i, j, h, w, out_size, virtual_crop_scale=(1.0, 1.5)):
    """Reference RandomResizeCrop.forward with fixed params
    (augmentations.py:40-55)."""
    x = torch.from_numpy(lms)  # (C, F, T)
    vh = int(x.shape[-2] * virtual_crop_scale[0])
    vw = int(x.shape[-1] * virtual_crop_scale[1])
    canvas = torch.zeros((x.shape[0], vh, vw))
    yo, xo = (vh - x.shape[-2]) // 2, (vw - x.shape[-1]) // 2
    canvas[:, yo : yo + x.shape[-2], xo : xo + x.shape[-1]] = x
    crop = canvas[:, i : i + h, j : j + w]
    out = F.interpolate(
        crop.unsqueeze(0), size=out_size, mode="bicubic", align_corners=True
    ).squeeze(0)
    return out.numpy()


class TestRandomResizeCrop:
    def test_bicubic_parity_fixed_params(self, rng):
        lms = rng.standard_normal((1, 64, 96)).astype(np.float32)
        for (i, j, h, w) in [(0, 10, 50, 80), (5, 0, 59, 144), (0, 24, 64, 96), (3, 40, 40, 30)]:
            ref = torch_crop_resize(lms, i, j, h, w, (64, 96))
            ours = np.asarray(
                A.resize_bicubic_crop(jnp.asarray(lms), i, j, h, w, (64, 96))
            )
            np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_extreme_crops(self, rng):
        """1-pixel-wide crops and crops larger than the input."""
        lms = rng.standard_normal((1, 64, 96)).astype(np.float32)
        for (i, j, h, w) in [(10, 10, 1, 96), (0, 0, 64, 1), (0, 0, 64, 144)]:
            ref = torch_crop_resize(lms, i, j, h, w, (64, 96))
            ours = np.asarray(
                A.resize_bicubic_crop(jnp.asarray(lms), i, j, h, w, (64, 96))
            )
            np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_local_crop_parity(self, rng):
        """Local crops: out 16x16, virtual_crop_scale (1,1)."""
        lms = rng.standard_normal((1, 64, 96)).astype(np.float32)
        for (i, j, h, w) in [(4, 20, 10, 30), (0, 0, 3, 4)]:
            ref = torch_crop_resize(lms, i, j, h, w, (16, 16), virtual_crop_scale=(1.0, 1.0))
            ours = np.asarray(
                A.resize_bicubic_crop(
                    jnp.asarray(lms), i, j, h, w, (16, 16), virtual_crop_scale=(1.0, 1.0)
                )
            )
            np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_random_batched_shapes_and_spread(self, rng):
        lms = jnp.asarray(rng.standard_normal((8, 1, 64, 96)).astype(np.float32))
        out = A.random_resize_crop(jax.random.key(0), lms)
        assert out.shape == (8, 1, 64, 96)
        # different samples must get different crops
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
        # different keys change the result
        out2 = A.random_resize_crop(jax.random.key(1), lms)
        assert not np.allclose(np.asarray(out), np.asarray(out2))


class TestMixup:
    def test_first_call_identity_and_bank_update(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 1, 8, 12)).astype(np.float32))
        state = A.init_mixup_state(16, (1, 8, 12))
        out, state = A.mixup_byola(jax.random.key(0), x, state)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))  # empty bank
        assert int(state.count) == 4 and int(state.pos) == 4
        np.testing.assert_allclose(np.asarray(state.bank[:4]), np.asarray(x))

    def test_second_call_mixes_with_bank(self, rng):
        x1 = jnp.asarray(rng.standard_normal((4, 1, 8, 12)).astype(np.float32))
        x2 = jnp.asarray(rng.standard_normal((4, 1, 8, 12)).astype(np.float32))
        state = A.init_mixup_state(16, (1, 8, 12))
        _, state = A.mixup_byola(jax.random.key(0), x1, state)
        out, state = A.mixup_byola(jax.random.key(1), x2, state)
        assert not np.allclose(np.asarray(out), np.asarray(x2))
        # mixed = log((1-a) e^x + a e^z + eps) with a <= 0.2 stays close to x
        assert np.abs(np.asarray(out) - np.asarray(x2)).max() < 2.0

    def test_ring_wraparound(self, rng):
        state = A.init_mixup_state(8, (1, 2, 2))
        for step in range(3):
            x = jnp.full((4, 1, 2, 2), float(step))
            _, state = A.mixup_byola(jax.random.key(step), x, state)
        assert int(state.count) == 8
        assert int(state.pos) == 4
        # bank rows 0-3 hold step-2 data (wrapped), rows 4-7 step-1
        assert float(state.bank[0, 0, 0, 0]) == 2.0
        assert float(state.bank[4, 0, 0, 0]) == 1.0

    def test_dus_write_matches_scatter_fallback(self, rng):
        """The contiguous dynamic-update-slice write (taken when B | n) must
        leave the bank byte-identical to the modular-row scatter fallback
        (taken otherwise) across a wrap of the ring."""
        xs = [jnp.asarray(rng.standard_normal((4, 1, 2, 3)).astype(np.float32))
              for _ in range(5)]
        # B=4 divides n=8 -> DUS branch
        s_dus = A.init_mixup_state(8, (1, 2, 3))
        for step, x in enumerate(xs):
            _, s_dus = A.mixup_byola(jax.random.key(step), x, s_dus)
        # oracle: replay the modular-row writes by hand
        bank = np.zeros((8, 1, 2, 3), np.float32)
        pos = 0
        for x in xs:
            rows = (pos + np.arange(4)) % 8
            bank[rows] = np.asarray(x)
            pos = (pos + 4) % 8
        np.testing.assert_array_equal(np.asarray(s_dus.bank), bank)
        assert int(s_dus.pos) == pos

    def test_log_mixup_exp_formula(self, rng):
        xa = rng.standard_normal((3, 4)).astype(np.float32)
        xb = rng.standard_normal((3, 4)).astype(np.float32)
        alpha = 0.85
        ours = np.asarray(A.log_mixup_exp(jnp.asarray(xa), jnp.asarray(xb), alpha))
        ref = np.log(alpha * np.exp(xa) + (1 - alpha) * np.exp(xb) + np.finfo(np.float32).eps)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestFaderNoiseNorm:
    def test_linear_fader_is_linear_ramp(self, rng):
        x = jnp.zeros((2, 1, 4, 10))
        out = np.asarray(A.random_linear_fader(jax.random.key(0), x))
        # each sample: out[..., t] linear in t, same across mel bins
        for b in range(2):
            ramp = out[b, 0, 0]
            diffs = np.diff(ramp)
            np.testing.assert_allclose(diffs, diffs[0], atol=1e-6)
            np.testing.assert_allclose(out[b, 0, 1], ramp, atol=1e-7)
        assert abs(out).max() <= 1.0

    def test_gaussian_noise_changes_input(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 1, 8, 12)).astype(np.float32))
        out = A.mix_gaussian_noise(jax.random.key(0), x)
        assert out.shape == x.shape
        assert not np.allclose(np.asarray(out), np.asarray(x))

    def test_normalize_batch_matches_torch(self, rng):
        x = rng.standard_normal((8, 1, 16, 24)).astype(np.float32) * 3 + 1
        ours = np.asarray(A.normalize_batch(jnp.asarray(x)))
        xt = torch.from_numpy(x)
        mean = xt.mean(dim=[0, 2, 3], keepdims=True)
        std = torch.clamp(xt.std(dim=[0, 2, 3], keepdims=True), torch.finfo().eps)
        ref = ((xt - mean) / std).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestRunningNorm:
    def test_matches_reference_statefulness(self, rng):
        """Replicates reference RunningNorm incl. its off-by-one mean update."""
        xs = [rng.standard_normal((1, 8, 12)).astype(np.float32) * 2 + 1 for _ in range(5)]
        # reference implementation in numpy
        n, mu = 0, None
        s2n, s2 = 0, None
        ref_outs = []
        for x in xs:
            m = x.mean(axis=(1, 2), keepdims=True)
            if n == 0:
                mu = m
            else:
                mu = mu + (m - mu) / n
            n += 1
            d2 = ((x - mu) ** 2).mean(axis=(1, 2), keepdims=True)
            if s2n == 0:
                s2 = d2
            else:
                s2 = s2 + (d2 - s2) / s2n
            s2n += 1
            std = np.clip(np.sqrt(s2), np.finfo(np.float32).eps, None)
            ref_outs.append((x - mu) / std)

        state = A.init_running_norm_state((1, 1, 1))
        for x, ref in zip(xs, ref_outs):
            out, state = A.running_norm(jnp.asarray(x), state, max_update=100)
            np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_freezes_after_max_update(self, rng):
        state = A.init_running_norm_state((1, 1, 1))
        x = jnp.asarray(rng.standard_normal((1, 8, 12)).astype(np.float32))
        _, state = A.running_norm(x, state, max_update=1)
        frozen_mu = np.asarray(state.mu).copy()
        y = jnp.asarray(rng.standard_normal((1, 8, 12)).astype(np.float32) + 10)
        _, state2 = A.running_norm(y, state, max_update=1)
        np.testing.assert_allclose(np.asarray(state2.mu), frozen_mu)


class TestPairTransform:
    def test_views_shapes_and_state(self, rng):
        cfg = default_config(batch_size=4, local_crops_number=2, Gnoise=True)
        lms = jnp.asarray(rng.standard_normal((4, 1, 64, 96)).astype(np.float32))
        state = init_augment_state(cfg)
        views, state = make_pair_views(jax.random.key(0), lms, state, cfg)
        assert len(views) == 4
        assert views[0].shape == (4, 1, 64, 96)
        assert views[1].shape == (4, 1, 64, 96)
        assert views[2].shape == (4, 1, 16, 16)
        # the bank receives each input once per step (see transforms.py)
        assert int(state.mixup.count) == 4
        # two global views must differ (independent augmentation draws)
        assert not np.allclose(np.asarray(views[0]), np.asarray(views[1]))

    def test_jit_compatible(self, rng):
        cfg = default_config(batch_size=4)
        lms = jnp.asarray(rng.standard_normal((4, 1, 64, 96)).astype(np.float32))
        state = init_augment_state(cfg)

        @jax.jit
        def step(key, lms, state):
            return make_pair_views(key, lms, state, cfg)

        views, state2 = step(jax.random.key(0), lms, state)
        views, state3 = step(jax.random.key(1), lms, state2)
        assert int(state3.mixup.count) == 8

    def test_post_norm(self, rng):
        cfg = default_config(batch_size=8, post_norm=True, mixup=False, RRC=False, RLF=False)
        lms = jnp.asarray((rng.standard_normal((8, 1, 64, 96)) * 5 + 3).astype(np.float32))
        state = init_augment_state(cfg)
        views, _ = make_pair_views(jax.random.key(0), lms, state, cfg)
        v = np.asarray(views[0])
        np.testing.assert_allclose(v.mean(), 0.0, atol=1e-4)
        np.testing.assert_allclose(v.std(), 1.0, atol=1e-2)


class TestPreNorm:
    def test_pre_norm_in_pair_views(self, rng):
        cfg = default_config(batch_size=8, pre_norm=True, mixup=False, RRC=False, RLF=False)
        lms = jnp.asarray((rng.standard_normal((8, 1, 64, 96)) * 4 + 7).astype(np.float32))
        state = init_augment_state(cfg)
        assert state.running_norm is not None
        views, state2 = make_pair_views(jax.random.key(0), lms, state, cfg)
        v = np.asarray(views[0])
        # first batch: normalized by its own stats -> ~N(0,1)
        assert abs(v.mean()) < 0.1 and abs(v.std() - 1.0) < 0.1
        assert int(state2.running_norm.n) == 1

    def test_pre_norm_state_threads_with_mixup(self, rng):
        cfg = default_config(batch_size=4, pre_norm=True, mixup=True,
                             mixup_n_memory=8, RRC=False, RLF=False)
        lms = jnp.asarray(rng.standard_normal((4, 1, 64, 96)).astype(np.float32))
        state = init_augment_state(cfg)
        _, state = make_pair_views(jax.random.key(0), lms, state, cfg)
        _, state = make_pair_views(jax.random.key(1), lms, state, cfg)
        assert int(state.running_norm.n) == 2
        assert int(state.mixup.count) == 8
