"""Token-drop masked forward == key-bias masked forward.

The ViT masked forward has two implementations of the reference's
random_masking (mae.py:330-346): the key-bias path (traced mask_ratio, all L
tokens computed, masked keys biased to -inf) and the token-drop path (static
len_keep, masked tokens gathered out — the reference's own compute shape).
Under the same 'mask' rng stream both select the same token set, and attention
restricted to visible keys is the same computation — so kept-token outputs
must match to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_audio_tpu.models import vit


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _vit(use_decoder=False):
    return vit.get_mae_vit("tiny", [16, 16], False, img_size=(64, 96),
                           use_decoder=use_decoder)


class TestTokenDrop:
    RATIO = 0.25          # L=24 -> len_keep = 18 (exact in f32 and f64)

    def _setup(self, rng, use_decoder=False):
        enc = _vit(use_decoder)
        x = jnp.asarray(rng.standard_normal((3, 1, 64, 96)).astype(np.float32))
        variables = enc.init(
            {"params": jax.random.key(0), "mask": jax.random.key(1)}, x,
            train=False, masked_recon=use_decoder,
            mask_ratio=self.RATIO if use_decoder else 0,
        )
        return enc, variables, x

    def test_mean_pool_latent_matches(self, rng):
        enc, variables, x = self._setup(rng)
        kw = dict(mask_ratio=self.RATIO, mean_pool=True, train=False)
        mask_key = {"mask": jax.random.key(3)}
        bias = enc.apply(variables, x, rngs=mask_key, **kw)
        drop = enc.apply(variables, x, rngs=mask_key, len_keep=18, **kw)
        np.testing.assert_allclose(np.asarray(bias), np.asarray(drop),
                                   rtol=1e-5, atol=1e-5)

    def test_cls_latent_matches(self, rng):
        enc, variables, x = self._setup(rng)
        kw = dict(mask_ratio=self.RATIO, mean_pool=False, train=False)
        mask_key = {"mask": jax.random.key(5)}
        bias = enc.apply(variables, x, rngs=mask_key, **kw)
        drop = enc.apply(variables, x, rngs=mask_key, len_keep=18, **kw)
        np.testing.assert_allclose(np.asarray(bias), np.asarray(drop),
                                   rtol=1e-5, atol=1e-5)

    def test_masked_recon_loss_matches(self, rng):
        enc, variables, x = self._setup(rng, use_decoder=True)
        kw = dict(mask_ratio=self.RATIO, mean_pool=True, masked_recon=True,
                  train=False)
        mask_key = {"mask": jax.random.key(11)}
        lat_b, loss_b = enc.apply(variables, x, rngs=mask_key, **kw)
        lat_d, loss_d = enc.apply(variables, x, rngs=mask_key, len_keep=18, **kw)
        np.testing.assert_allclose(np.asarray(lat_b), np.asarray(lat_d),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(loss_b), float(loss_d),
                                   rtol=1e-5, atol=1e-6)

    def test_len_keep_zero_keeps_only_cls(self, rng):
        enc, variables, x = self._setup(rng)
        out = enc.apply(variables, x, mask_ratio=1.0, mean_pool=False,
                        len_keep=0, train=False,
                        rngs={"mask": jax.random.key(1)})
        assert out.shape == (3, enc.embed_dim)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_step_loss_matches(self, rng):
        """Full BT train step: static len_keep produces the same loss as the
        traced key-bias masking (same rng stream)."""
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.train.steps import make_train_step

        cfg = default_config(model_type="vit_tiny", batch_size=4, mask=True,
                             mask_ratio=self.RATIO, projector_hidden_dim=32,
                             projector_out_dim=8)
        mods, state = init_train_state(cfg, jax.random.key(0))
        step = make_train_step(mods, donate=False)
        batch = jnp.asarray(
            rng.standard_normal((4, 1, cfg.n_mels, cfg.crop_frames))
            .astype(np.float32))
        key = jax.random.key(42)
        _, m_bias = step(state, batch, key, jnp.float32(self.RATIO))
        _, m_drop = step(state, batch, key, jnp.float32(self.RATIO),
                         len_keep=18)
        np.testing.assert_allclose(float(m_bias["loss"]), float(m_drop["loss"]),
                                   rtol=1e-4)

    def test_sharded_step_with_len_keep(self, rng):
        """Token-drop (static len_keep) under an 8-device data mesh: the
        per-sample gather shards over the batch axis and the loss matches the
        unsharded run."""
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.parallel import get_mesh, shard_batch
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.train.steps import make_train_step

        assert len(jax.devices()) == 8
        cfg = default_config(model_type="vit_tiny", batch_size=16, mask=True,
                             mask_ratio=self.RATIO, mixup=False,
                             projector_hidden_dim=32, projector_out_dim=8)
        mods, state = init_train_state(cfg, jax.random.key(0))
        step = make_train_step(mods, donate=False)
        batch = jnp.asarray(
            rng.standard_normal((16, 1, cfg.n_mels, cfg.crop_frames))
            .astype(np.float32))
        _, m_single = step(state, batch, jax.random.key(1), jnp.float32(self.RATIO),
                           len_keep=18)
        mesh = get_mesh(8)
        sharded = shard_batch(np.asarray(batch), mesh)
        _, m_shard = step(state, sharded, jax.random.key(1), jnp.float32(self.RATIO),
                          len_keep=18)
        np.testing.assert_allclose(float(m_single["loss"]),
                                   float(m_shard["loss"]), rtol=1e-4)

    def test_trainer_computes_len_keep(self):
        """Trainer wiring: _token_L set for masked ViT runs, len_keep
        quantization matches the reference's int(L*(1-r))."""
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.models import build_encoder

        cfg = default_config(model_type="vit_tiny", mask=True, mask_ratio=0.3)
        enc, _ = build_encoder(cfg)
        gh, gw = enc.grid_size()
        L = gh * gw
        assert L == 24
        assert int(np.floor(L * (1.0 - 0.3))) == 16
