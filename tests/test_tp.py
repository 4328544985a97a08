"""Tensor parallelism (--model_parallel): 2-D (data, model) mesh.

Beyond reference parity (the reference is DDP-only, SURVEY.md §2.3): the
GSPMD tensor-parallel placement must be semantics-preserving — the same
train step on a (4, 2) mesh with Megatron-sharded transformer kernels
reproduces the 1-D data-parallel loss, while actually storing each kernel
shard (and its AdamW moments) on only the devices of one model-axis slice.
"""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.parallel import get_mesh, place_state, shard_batch, state_shardings
from ssl_audio_tpu.parallel.mesh import _tp_spec
from ssl_audio_tpu.train.state import init_train_state
from ssl_audio_tpu.train.steps import make_train_step


class TestSpecRules:
    def test_column_and_row_rules(self):
        assert _tp_spec("params/encoder/block0/attn/qkv_kernel", (192, 576), 2) \
            == P(None, "model")
        assert _tp_spec("params/encoder/block3/attn/proj/kernel", (192, 192), 2) \
            == P("model", None)
        assert _tp_spec("params/encoder/block0/mlp/fc1/kernel", (192, 768), 2) \
            == P(None, "model")
        assert _tp_spec("params/encoder/block0/mlp/fc1/bias", (768,), 2) == P("model")
        assert _tp_spec("params/encoder/block0/mlp/fc2/kernel", (768, 192), 2) \
            == P("model", None)

    def test_opt_state_mirrors_params(self):
        # mu/nu live under a different prefix but the same suffix
        assert _tp_spec("opt_state/0/mu/encoder/block0/mlp/fc1/kernel",
                        (192, 768), 2) == P(None, "model")

    def test_non_divisible_falls_back_to_replicated(self):
        assert _tp_spec("params/encoder/block0/mlp/fc1/kernel", (192, 770), 4) == P()

    def test_everything_else_replicated(self):
        assert _tp_spec("params/encoder/block0/norm1/scale", (192,), 2) == P()
        assert _tp_spec("params/encoder/patch_embed/proj/kernel",
                        (16, 16, 1, 192), 2) == P()
        assert _tp_spec("params/head/bn0/scale", (64,), 2) == P()


def _sharded_leaf_count(params):
    n = 0
    for leaf in jax.tree.leaves(params):
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated:
            n += 1
    return n


@pytest.fixture(scope="module")
def vit_setup():
    cfg = default_config(
        model_type="vit_tiny", batch_size=16, mask=True,
        projector_hidden_dim=64, projector_out_dim=16,
        mixup_n_memory=32, epochs=1,
    )
    mods, state = init_train_state(cfg, jax.random.key(0), niter_per_ep=4)
    batch = np.random.default_rng(0).standard_normal(
        (cfg.batch_size, 1, cfg.n_mels, cfg.crop_frames)).astype(np.float32)
    return cfg, mods, state, batch


class TestTensorParallelStep:
    def test_tp_matches_dp(self, vit_setup):
        cfg, mods, state, batch = vit_setup
        # identical world_scale so the two runs are the same math; only the
        # placement (and therefore the GSPMD partitioning) differs
        step = make_train_step(mods, world_scale=4.0, donate=False)

        mesh_dp = get_mesh(8)
        s_dp = place_state(state, mesh_dp)
        out_dp, m_dp = step(s_dp, shard_batch(batch, mesh_dp),
                            jax.random.key(1), 0.3)

        mesh_tp = get_mesh(8, model_parallel=2)
        assert mesh_tp.shape == {"data": 4, "model": 2}
        s_tp = place_state(state, mesh_tp)
        # the placement really shards: every block contributes 5 TP leaves
        assert _sharded_leaf_count(s_tp.params) >= 5 * 12
        out_tp, m_tp = step(s_tp, shard_batch(batch, mesh_tp),
                            jax.random.key(1), 0.3)

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                                   rtol=2e-5)
        # updated params numerically match and STAY tensor-parallel-sharded
        # (no silent re-replication by the compiled step)
        qkv_dp = out_dp.params["encoder"]["block0"]["attn"]["qkv_kernel"]
        qkv_tp = out_tp.params["encoder"]["block0"]["attn"]["qkv_kernel"]
        # atol covers GSPMD reduction-order noise amplified through the
        # AdamW rsqrt (measured max 2.5e-5 over 110k elements)
        np.testing.assert_allclose(np.asarray(qkv_dp), np.asarray(qkv_tp),
                                   atol=1e-4)
        assert not qkv_tp.sharding.is_fully_replicated
        assert _sharded_leaf_count(out_tp.params) >= 5 * 12

    def test_opt_moments_sharded(self, vit_setup):
        cfg, mods, state, _ = vit_setup
        mesh_tp = get_mesh(8, model_parallel=2)
        sh = state_shardings(state, mesh_tp)
        specs = {s.spec for s in jax.tree.leaves(sh.opt_state)
                 if hasattr(s, "spec")}
        assert P(None, "model") in specs and P("model", None) in specs


class TestFSDP:
    def test_spec_rules(self):
        from ssl_audio_tpu.parallel.mesh import _fsdp_spec

        # largest divisible dim is sharded
        assert _fsdp_spec((192, 768), 8, 192 * 768) == P(None, "data")
        assert _fsdp_spec((768, 192), 8, 768 * 192) == P("data", None)
        # too small / nothing divisible -> replicated
        assert _fsdp_spec((64,), 8, 64) == P()
        assert _fsdp_spec((1001, 30), 8, 30030) == P()

    def test_fsdp_matches_dp(self, vit_setup):
        cfg, mods, state, batch = vit_setup
        step = make_train_step(mods, world_scale=8.0, donate=False)
        mesh = get_mesh(8)

        s_dp = place_state(state, mesh)
        _, m_dp = step(s_dp, shard_batch(batch, mesh), jax.random.key(1), 0.3)

        s_fs = place_state(state, mesh, fsdp=True)
        assert _sharded_leaf_count(s_fs.params) > 12
        # the mixup bank must NOT be sharded (per-example state, written by
        # dynamic row index)
        assert s_fs.aug.mixup.bank.sharding.is_fully_replicated
        out_fs, m_fs = step(s_fs, shard_batch(batch, mesh),
                            jax.random.key(1), 0.3)
        np.testing.assert_allclose(float(m_dp["loss"]), float(m_fs["loss"]),
                                   rtol=2e-5)
        # moments stay sharded after the step (shard-local optimizer update)
        n_opt = sum(
            1 for leaf in jax.tree.leaves(out_fs.opt_state)
            if hasattr(leaf, "sharding")
            and not leaf.sharding.is_fully_replicated)
        assert n_opt > 12


class TestShardedCheckpoint:
    def test_roundtrip_under_tp_fsdp(self, vit_setup, tmp_path):
        """Resume of a sharded run: device_get gathers the TP+FSDP shards,
        Orbax round-trips the host tree, and place_state re-shards — the
        restored params must equal the saved ones exactly and come back
        sharded."""
        import os

        from ssl_audio_tpu.utils import checkpoint as ckpt_lib

        cfg, mods, state, batch = vit_setup
        mesh = get_mesh(8, model_parallel=2)
        step = make_train_step(mods, world_scale=4.0, donate=False)
        s = place_state(state, mesh, fsdp=True)
        s, _ = step(s, shard_batch(batch, mesh), jax.random.key(1), 0.3)

        path = os.path.join(str(tmp_path), "ckpt")
        host = jax.device_get(s)
        ckpt_lib.save_checkpoint(path, host, epoch=1)
        restored, next_epoch = ckpt_lib.load_checkpoint(path, host)
        assert next_epoch == 1

        r = place_state(restored, mesh, fsdp=True)
        a = s.params["encoder"]["block0"]["attn"]["qkv_kernel"]
        b = r.params["encoder"]["block0"]["attn"]["qkv_kernel"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not b.sharding.is_fully_replicated
        # and the resumed state steps again (same compiled signature)
        r2, m = step(r, shard_batch(batch, mesh), jax.random.key(2), 0.3)
        assert np.isfinite(float(m["loss"]))


class TestTrainerModelParallel:
    def test_one_epoch(self, tmp_path):
        from ssl_audio_tpu.train.loop import Trainer

        cfg = default_config(
            dataset="synthetic", model_type="vit_tiny", batch_size=16,
            epochs=1, synthetic_steps_per_epoch=2, model_parallel=2,
            projector_hidden_dim=64, projector_out_dim=16, mixup_n_memory=32,
            mask=True, token_drop=False,
        )
        tr = Trainer(cfg, log_dir=str(tmp_path))
        assert tr.mesh.shape == {"data": 4, "model": 2}
        assert _sharded_leaf_count(tr.state.params) >= 5 * 12
        loss = tr.train_one_epoch(1)
        assert np.isfinite(loss) and loss > 0
        # params remain TP-sharded after real epoch steps
        assert _sharded_leaf_count(tr.state.params) >= 5 * 12
