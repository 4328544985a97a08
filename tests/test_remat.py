"""--remat (gradient checkpointing of ViT blocks): identical outputs and
gradients, less peak activation memory (the jax.checkpoint contract)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_audio_tpu.models import vit


@pytest.fixture
def rng():
    return np.random.default_rng(3)


class TestRemat:
    def test_outputs_and_grads_match(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        enc = vit.get_mae_vit("tiny", [16, 16], False, img_size=(64, 96))
        enc_r = vit.get_mae_vit("tiny", [16, 16], False, img_size=(64, 96),
                                remat=True)
        variables = enc.init({"params": jax.random.key(0)}, x, train=False)

        def loss(params, module):
            out = module.apply({"params": params}, x, train=False)
            return (out ** 2).mean()

        l0, g0 = jax.value_and_grad(loss)(variables["params"], enc)
        l1, g1 = jax.value_and_grad(loss)(variables["params"], enc_r)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for p0, p1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                       rtol=1e-5, atol=1e-6)

    def test_train_step_with_remat(self, rng):
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.train.steps import make_train_step

        cfg = default_config(model_type="vit_tiny", batch_size=4, mask=True,
                             mask_ratio=0.25, remat=True,
                             projector_hidden_dim=32, projector_out_dim=8)
        mods, state = init_train_state(cfg, jax.random.key(0))
        step = make_train_step(mods, donate=False)
        batch = jnp.asarray(
            rng.standard_normal((4, 1, cfg.n_mels, cfg.crop_frames))
            .astype(np.float32))
        state, m = step(state, batch, jax.random.key(1), jnp.float32(0.25),
                        len_keep=18)
        assert np.isfinite(float(m["loss"]))
