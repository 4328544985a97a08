"""Fused multi-head attention Pallas kernel (ops/fused_attention.py) parity
against the einsum composition it replaces (models/vit.py AttentionKBiasZero,
reference mae.py:102-141): forward values, dqkv/dbias gradients, the key-bias
masking path, the shard_map data-mesh form, and full model / train-step
integration with fused_attention on vs off."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_audio_tpu.models import vit
from ssl_audio_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_sharded,
    supports,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def einsum_reference(qkv, bias, heads, mxu=True):
    """The exact math the kernel implements, via einsum.  mxu=True casts dot
    operands to bf16 with f32 accumulation (the kernel's _mxu contract and
    what XLA DEFAULT precision does on the TPU MXU); mxu=False is the pure
    f32 path the model falls back to on CPU."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    q, k, v = (qkv[..., i * C:(i + 1) * C].reshape(B, N, heads, hd)
               .transpose(0, 2, 1, 3) for i in range(3))
    cast = (lambda t: t.astype(jnp.bfloat16)) if mxu else (lambda t: t)
    s = jnp.einsum("bhnd,bhmd->bhnm", cast(q), cast(k),
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", cast(p), cast(v),
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(qkv.dtype)


def make_inputs(rng, B=4, N=25, C=192, heads=3, masked=False):
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)).astype(np.float32))
    if masked:
        # the model's token mask: a random suffix of keys biased to -1e9
        keep = rng.integers(low=N // 2, high=N, size=B)
        bias = np.where(np.arange(N)[None] < keep[:, None], 0.0, vit.NEG_INF)
        bias = jnp.asarray(bias.astype(np.float32))
    else:
        bias = jnp.zeros((B, N), jnp.float32)
    return qkv, bias, heads


class TestForward:
    @pytest.mark.parametrize("N,C,heads", [(25, 192, 3), (49, 768, 12),
                                           (18, 384, 6)])
    def test_values_vs_mxu_reference(self, rng, N, C, heads):
        qkv, bias, _ = make_inputs(rng, N=N, C=C, heads=heads)
        out_f = fused_attention(qkv, bias, heads)
        out_r = einsum_reference(qkv, bias, heads, mxu=True)
        np.testing.assert_allclose(out_f, out_r, atol=2e-3, rtol=1e-3)

    def test_masked_keys(self, rng):
        qkv, bias, heads = make_inputs(rng, masked=True)
        out_f = fused_attention(qkv, bias, heads)
        out_r = einsum_reference(qkv, bias, heads, mxu=True)
        np.testing.assert_allclose(out_f, out_r, atol=2e-3, rtol=1e-3)
        # fully-masked keys get ~zero probability: perturbing a masked key's
        # v must not change the output
        C = qkv.shape[-1] // 3
        qkv2 = qkv.at[:, -1, 2 * C:].add(100.0)
        bias2 = bias.at[:, -1].set(vit.NEG_INF)
        a = fused_attention(qkv, bias2, heads)
        b = fused_attention(qkv2, bias2, heads)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_close_to_f32_path(self, rng):
        """Against the model's actual einsum fallback (pure f32) the gap is
        bf16 rounding only."""
        qkv, bias, heads = make_inputs(rng)
        out_f = fused_attention(qkv, bias, heads)
        out_r = einsum_reference(qkv, bias, heads, mxu=False)
        np.testing.assert_allclose(out_f, out_r, atol=5e-2, rtol=2e-2)

    def test_bf16_input(self, rng):
        qkv, bias, heads = make_inputs(rng)
        out = fused_attention(qkv.astype(jnp.bfloat16), bias, heads)
        assert out.dtype == jnp.bfloat16
        ref = einsum_reference(qkv, bias, heads, mxu=False)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   atol=8e-2, rtol=5e-2)

    def test_supports_envelope(self):
        assert supports(128, 25, 768, 12)
        assert supports(3, 49, 192, 3)
        assert not supports(4, 300, 192, 3)     # N > MAX_SEQ
        assert not supports(4, 25, 100, 4)      # hd=25 not 8-aligned
        assert not supports(4, 25, 768, 5)      # dim % heads != 0


class TestGradients:
    @pytest.mark.parametrize("masked", [False, True])
    def test_dqkv_dbias(self, rng, masked):
        qkv, bias, heads = make_inputs(rng, masked=masked)
        dout = jnp.asarray(
            rng.standard_normal(
                (qkv.shape[0], qkv.shape[1], qkv.shape[2] // 3))
            .astype(np.float32))

        def loss(fn, qkv, bias):
            return jnp.sum(fn(qkv, bias, heads) * dout)

        gf = jax.grad(functools.partial(loss, fused_attention),
                      argnums=(0, 1))(qkv, bias)
        gr = jax.grad(
            functools.partial(loss, lambda q, b, h: einsum_reference(
                q, b, h, mxu=True)), argnums=(0, 1))(qkv, bias)
        # bf16-rounded dots on both sides but different rounding points in
        # the VJPs; grads are O(1)
        np.testing.assert_allclose(gf[0], gr[0], atol=4e-2, rtol=2e-2,
                                   err_msg="dqkv")
        np.testing.assert_allclose(gf[1], gr[1], atol=4e-2, rtol=2e-2,
                                   err_msg="dbias")


class TestSharded:
    def test_matches_unsharded(self, rng):
        """shard_map over the 8-device data mesh == single-device kernel
        bitwise (attention is per-sample; no cross-shard quantities)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ssl_audio_tpu.parallel import get_mesh

        mesh = get_mesh(8)
        qkv, bias, heads = make_inputs(rng, B=16, masked=True)
        qs = jax.device_put(np.asarray(qkv), NamedSharding(mesh, P("data")))
        bs = jax.device_put(np.asarray(bias), NamedSharding(mesh, P("data")))
        out_s = jax.jit(functools.partial(
            fused_attention_sharded, num_heads=heads, mesh=mesh))(qs, bs)
        out_u = fused_attention(qkv, bias, heads)
        np.testing.assert_allclose(out_s, out_u, atol=0, rtol=0)

        dout = jnp.asarray(rng.standard_normal(out_u.shape).astype(np.float32))

        def loss(fn, qkv, bias):
            return jnp.sum(fn(qkv, bias) * dout)

        gs = jax.jit(jax.grad(functools.partial(
            loss, lambda q, b: fused_attention_sharded(q, b, heads, mesh)),
            argnums=(0, 1)))(qs, bs)
        gu = jax.grad(functools.partial(
            loss, lambda q, b: fused_attention(q, b, heads)),
            argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(gs[0], gu[0], atol=0, rtol=0)
        # dbias goes through an XLA-side head-fold reduction whose
        # association order differs between the jitted GSPMD program and
        # the eager single-device one — float-noise only
        np.testing.assert_allclose(gs[1], gu[1], atol=1e-5, rtol=1e-6)


class TestModelIntegration:
    def _models(self, use_decoder=False):
        kw = dict(img_size=(64, 96), use_decoder=use_decoder)
        plain = vit.get_mae_vit("tiny", [16, 16], False, **kw)
        fused = vit.get_mae_vit("tiny", [16, 16], False,
                                fused_attention=True, **kw)
        return plain, fused

    def test_forward_parity(self, rng):
        """Same params (flag adds none), same input -> bf16-rounding-level
        agreement through all 12 blocks."""
        plain, fused = self._models()
        x = jnp.asarray(rng.standard_normal((3, 1, 64, 96)).astype(np.float32))
        variables = plain.init(
            {"params": jax.random.key(0), "mask": jax.random.key(1)}, x,
            train=False)
        out_p = plain.apply(variables, x, train=False, mean_pool=True)
        out_f = fused.apply(variables, x, train=False, mean_pool=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                                   atol=5e-2, rtol=2e-2)

    def test_masked_recon_parity(self, rng):
        """Key-bias masked encoder + decoder (both fused) keep the recon
        loss and latent close to the einsum path."""
        plain, fused = self._models(use_decoder=True)
        x = jnp.asarray(rng.standard_normal((3, 1, 64, 96)).astype(np.float32))
        variables = plain.init(
            {"params": jax.random.key(0), "mask": jax.random.key(1)}, x,
            train=False, masked_recon=True, mask_ratio=0.25)
        kw = dict(mask_ratio=0.25, mean_pool=True, masked_recon=True,
                  train=False)
        mask_key = {"mask": jax.random.key(3)}
        lat_p, loss_p = plain.apply(variables, x, rngs=mask_key, **kw)
        lat_f, loss_f = fused.apply(variables, x, rngs=mask_key, **kw)
        np.testing.assert_allclose(np.asarray(lat_f), np.asarray(lat_p),
                                   atol=5e-2, rtol=2e-2)
        assert float(loss_f) == pytest.approx(float(loss_p), rel=5e-3)

    def test_return_attention_falls_back(self, rng):
        """return_attention routes through the einsum path (the kernel does
        not expose probs) — exact equality with the plain block."""
        x = jnp.asarray(rng.standard_normal((2, 25, 192)).astype(np.float32))
        plain = vit.Block(192, 3)
        fused = vit.Block(192, 3, fused_attention=True)
        variables = plain.init(jax.random.key(0), x, train=False)
        att_p = plain.apply(variables, x, train=False, return_attention=True)
        att_f = fused.apply(variables, x, train=False, return_attention=True)
        np.testing.assert_allclose(np.asarray(att_f), np.asarray(att_p),
                                   atol=0, rtol=0)

    def test_train_step_loss_parity(self):
        """Full BT train step with --fused_attention matches the einsum
        step at bf16-rounding tolerance."""
        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.train.steps import make_train_step

        losses = {}
        for fa in (False, True):
            cfg = default_config(
                dataset="synthetic", model_type="vit_tiny", batch_size=8,
                projector_hidden_dim=64, projector_out_dim=16,
                mixup_n_memory=8, mask=True, mask_ratio=0.25,
                random_mask_ratio=False, fused_attention=fa)
            mods, state = init_train_state(cfg, jax.random.key(0))
            step = make_train_step(mods, donate=False, raw=True)
            batch = jax.random.normal(jax.random.key(3), (8, 1, 64, 96))
            _, metrics = step(state, batch, jax.random.key(4),
                              jnp.float32(0.0))
            losses[fa] = float(metrics["loss"])
            assert np.isfinite(losses[fa])
        assert losses[True] == pytest.approx(losses[False], rel=2e-2)

    def test_config_flag_roundtrip(self):
        from ssl_audio_tpu.config import config_from_args

        base = ["--dataset", "synthetic", "--model_type", "vit_tiny"]
        assert config_from_args(base + ["--fused_attention"]
                                ).fused_attention is True
        assert config_from_args(base + ["--no_fused_attention"]
                                ).fused_attention is False
        assert config_from_args(base).fused_attention is None
