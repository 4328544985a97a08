"""Shape/semantics tests for the encoder zoo (reference parity documented per
test; shapes cross-checked against reference model.py / models/*.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.models import (
    AudioNTT2022,
    build_encoder,
    get_mae_vit,
    resnet18,
    resnet18_ReGP_NRF,
    resnet50,
    resnet50_ReGP_NRF,
)
from ssl_audio_tpu.models.heads import BarlowTwinsHead, BarlowTwinsPredictor
from ssl_audio_tpu.models.vit import random_token_mask


def init_and_apply(model, x, train=False, **kw):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "mask": jax.random.key(2), "droppath": jax.random.key(3)}
    variables = model.init(rngs, x, train=train, **kw)
    out = model.apply(
        variables, x, train=train,
        rngs={k: v for k, v in rngs.items() if k != "params"},
        mutable=["batch_stats"] if train else False,
        **kw,
    )
    if train:
        out = out[0]
    return out, variables


class TestAudioNTT:
    def test_output_shape(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        model = AudioNTT2022()
        out, variables = init_and_apply(model, x)
        assert out.shape == (2, 3072)
        assert model.embed_dim == 3072

    def test_se_variant(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        out, _ = init_and_apply(AudioNTT2022(squeeze_excitation=True), x)
        assert out.shape == (2, 3072)

    def test_param_count_close_to_reference(self):
        """Reference AudioNTT2022: ~ conv(1->64)+conv(64->64) + fc
        1024->2048->2048. Total ≈ 6.3M."""
        x = jnp.zeros((1, 1, 64, 96))
        _, variables = init_and_apply(AudioNTT2022(), x)
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        assert 6.0e6 < n < 6.5e6, n


class TestResNet:
    @pytest.mark.parametrize(
        "factory,dim",
        [(resnet18, 512), (resnet50, 2048), (resnet18_ReGP_NRF, 4096), (resnet50_ReGP_NRF, 16384)],
    )
    def test_embed_dims(self, factory, dim, rng):
        model = factory()
        assert model.embed_dim == dim
        x = jnp.asarray(rng.standard_normal((1, 1, 64, 96)).astype(np.float32))
        out, _ = init_and_apply(model, x)
        assert out.shape == (1, dim)

    def test_resnet18_param_count(self):
        """torchvision resnet18 ~11.7M params; deep stem C variant slightly
        less (no fc, 1-ch input)."""
        x = jnp.zeros((1, 1, 64, 96))
        _, variables = init_and_apply(resnet18(), x)
        n = sum(p.size for p in jax.tree.leaves(variables["params"]))
        assert 10e6 < n < 13e6, n


class TestViT:
    def test_cls_output(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        model = get_mae_vit("tiny")
        out, variables = init_and_apply(model, x)
        assert out.shape == (2, 192)
        assert model.grid_size() == (4, 6)

    def test_conv_stem_depth11(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        model = get_mae_vit("tiny", [16, 8], c=True)
        out, variables = init_and_apply(model, x, train=True)
        assert out.shape == (2, 192)
        n_blocks = len([k for k in variables["params"] if k.startswith("block")])
        assert n_blocks == 11
        assert model.grid_size() == (4, 12)

    def test_patch16x8_grid(self):
        model = get_mae_vit("base", [16, 8])
        assert model.grid_size() == (4, 12)

    def test_masking_excludes_tokens(self, rng):
        """With mask_ratio>0 under a fixed mask, CLS must depend only on
        visible tokens: perturbing a masked patch cannot change the output."""
        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((1, 1, 64, 96)).astype(np.float32))
        rngs = {"params": jax.random.key(0)}
        variables = model.init(rngs, x, train=False)
        mask = np.zeros((1, 24), np.float32)
        mask[0, 5] = 1.0  # mask patch 5 (row 0, col 5)
        out1 = model.apply(variables, x, mask=jnp.asarray(mask), train=False)
        x2 = np.asarray(x).copy()
        x2[0, 0, 0:16, 80:96] += 100.0  # patch (0,5) spans rows 0-16, cols 80-96
        out2 = model.apply(variables, jnp.asarray(x2), mask=jnp.asarray(mask), train=False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
        # sanity: perturbing a VISIBLE patch does change the output
        x3 = np.asarray(x).copy()
        x3[0, 0, 0:16, 0:16] += 100.0
        out3 = model.apply(variables, jnp.asarray(x3), mask=jnp.asarray(mask), train=False)
        assert np.abs(np.asarray(out3) - np.asarray(out1)).max() > 1e-3

    def test_random_token_mask_ratio(self):
        mask = np.asarray(random_token_mask(jax.random.key(0), 16, 24, 0.75))
        # len_keep = floor(24*0.25) = 6 -> 18 masked per sample
        assert mask.shape == (16, 24)
        np.testing.assert_array_equal(mask.sum(axis=1), 18)

    def test_traced_mask_ratio_single_compile(self, rng):
        """mask_ratio can vary per call without recompilation."""
        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        calls = 0

        def fwd(ratio):
            nonlocal calls
            calls += 1
            return model.apply(variables, x, mask_ratio=ratio, train=False,
                               rngs={"mask": jax.random.key(7)})

        jfwd = jax.jit(fwd)
        o1 = jfwd(0.3)
        o2 = jfwd(0.62)
        assert calls == 1  # traced once
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_masked_recon_loss(self, rng):
        model = get_mae_vit("tiny", use_decoder=True)
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                               x, train=False, masked_recon=True, mask_ratio=0.75)
        latent, loss = model.apply(
            variables, x, mask_ratio=0.75, masked_recon=True, train=False,
            rngs={"mask": jax.random.key(2)},
        )
        assert latent.shape == (2, 192)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_mean_pool_and_return_all(self, rng):
        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        pooled = model.apply(variables, x, mean_pool=True, train=False)
        allt = model.apply(variables, x, return_all=True, train=False)
        assert pooled.shape == (2, 192)
        assert allt.shape == (2, 25, 192)
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(allt[:, 1:].mean(axis=1)), atol=1e-5
        )

    def test_variable_input_size_pos_interp(self, rng):
        """Local crops (16x16) go through pos-embed interpolation."""
        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 16, 16)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 192)

    def test_forward_attn(self, rng):
        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        attns = model.apply(variables, x, train=False, method=model.forward_attn)
        assert attns.shape == (12, 2, 3, 25, 25)  # (depth, B, heads, N, N)
        np.testing.assert_allclose(np.asarray(attns.sum(-1)), 1.0, atol=1e-5)

    def test_patchify_roundtrip(self, rng):
        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        p = model.patchify(x)
        assert p.shape == (2, 24, 256)
        np.testing.assert_allclose(np.asarray(model.unpatchify(p)), np.asarray(x), atol=1e-6)


class TestHeads:
    def test_projector_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 3072)).astype(np.float32))
        head = BarlowTwinsHead(projector_n_hidden_layers=1, projector_hidden_dim=128,
                               projector_out_dim=64)
        variables = head.init({"params": jax.random.key(0)}, x, train=False)
        out = head.apply(variables, x, train=False)
        assert out.shape == (8, 64)

    def test_predictor_identity_when_off(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        pred = BarlowTwinsPredictor(use=False)
        variables = pred.init({"params": jax.random.key(0)}, x, train=False)
        out = pred.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_predictor_on(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        pred = BarlowTwinsPredictor(use=True)
        variables = pred.init({"params": jax.random.key(0)}, x, train=False)
        out = pred.apply(variables, x, train=False)
        assert out.shape == (8, 256)
        assert not np.allclose(np.asarray(out), np.asarray(x))


class TestWrapper:
    @pytest.mark.parametrize(
        "model_type,dim",
        [
            ("audiontt", 3072),
            ("resnet18", 512),
            ("resnet18_ReGP_NRF", 4096),
            ("vit_tiny", 192),
            ("vitc_tiny", 192),
        ],
    )
    def test_build(self, model_type, dim):
        cfg = default_config(model_type=model_type)
        enc, d = build_encoder(cfg)
        assert d == dim


class TestIntermediateLayers:
    def test_intermediate_layers(self, rng):
        from ssl_audio_tpu.models import get_mae_vit

        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        outs = model.apply(variables, x, train=False,
                           method=model.get_intermediate_layers)
        assert len(outs) == 12
        assert all(o.shape == (2, 25, 192) for o in outs)
        # final intermediate equals the normed full-forward tokens
        allt = model.apply(variables, x, return_all=True, train=False)
        np.testing.assert_allclose(np.asarray(outs[-1]), np.asarray(allt), atol=1e-5)
