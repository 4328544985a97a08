"""`--layout_barrier`: materialize attention-layout transposes as standalone
copies instead of letting XLA fold them into consumer GEMM operand reads.

jax.lax.optimization_barrier is semantically the identity, so every output
and gradient must be BIT-IDENTICAL with the flag on/off — only the compiled
schedule may differ.  (Perf adjudication: tools/gemm_probe.py + the
interleaved full-step A/B in PERF.md "Layout barriers (r4)".)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_audio_tpu.models import vit


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_forward_and_grad_bit_identical(rng):
    x = jnp.asarray(rng.standard_normal((3, 1, 64, 96)), jnp.float32)
    outs = {}
    for lb in (False, True):
        enc = vit.get_mae_vit("tiny", [16, 16], layout_barrier=lb)
        variables = enc.init({"params": jax.random.key(0)}, x, train=False)

        def loss(v):
            return enc.apply(v, x, train=False, mean_pool=True).sum()

        l, g = jax.value_and_grad(loss)(variables)
        outs[lb] = (np.asarray(l), jax.tree.map(np.asarray, g))
    assert outs[False][0] == outs[True][0]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        outs[False][1], outs[True][1])


def test_train_step_loss_bit_identical():
    """Full BT train step via the config flag: identical loss trajectory."""
    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.train.state import init_train_state
    from ssl_audio_tpu.train.steps import make_train_step

    losses = {}
    for lb in (False, True):
        cfg = default_config(
            dataset="synthetic", model_type="vit_tiny", batch_size=8,
            projector_hidden_dim=64, projector_out_dim=16,
            mixup_n_memory=8, mask=True, mask_ratio=0.25,
            random_mask_ratio=False, layout_barrier=lb)
        mods, state = init_train_state(cfg, jax.random.key(0))
        step = make_train_step(mods, donate=False, raw=True)
        batch = jnp.asarray(
            np.random.default_rng(1).standard_normal((8, 1, 64, 96)),
            jnp.float32)
        ls = []
        for i in range(2):
            state, metrics = step(state, batch, jax.random.fold_in(
                jax.random.key(2), i), jnp.float32(cfg.mask_ratio))
            ls.append(float(metrics["loss"]))
        losses[lb] = ls
    assert losses[False] == losses[True]


def test_flag_plumbs_through_wrapper():
    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.models import build_encoder

    for lb, want in ((True, True), (False, False), (None, False)):
        cfg = default_config(model_type="vit_tiny", layout_barrier=lb)
        enc, _ = build_encoder(cfg)
        assert enc.spec.layout_barrier is want


def test_cli_flag_roundtrip():
    from ssl_audio_tpu.config import config_from_args

    cfg = config_from_args(["--model_type", "vit_base", "--layout_barrier"])
    assert cfg.layout_barrier is True
    cfg = config_from_args(["--model_type", "vit_base",
                            "--no_layout_barrier"])
    assert cfg.layout_barrier is False
    cfg = config_from_args(["--model_type", "vit_base"])
    assert cfg.layout_barrier is None
