"""Old-gen (legacy) trainer optimizer recipe (SURVEY §2.2).

The reference's DINO/BYOL-A trainers carry their own optimizer setups,
separate from the active tree's hyperparameters.py defaults:

- DINO: AdamW over the get_param_groups split with a per-iteration cosine
  lr schedule (base_lr·batch/256 linear scaling, warmup_epochs) AND a
  cosine weight-decay schedule (old/methods/dino.py:125-147).
- BYOL-A: plain Adam at a constant lr (old/byola/pretrain.py:142).

These tests pin the traceable cosine factor to the numpy scheduler
(utils/schedules.cosine_scheduler == reference old/utils/utils.py:62-74),
the method defaults, the head dims, and the dino.yaml load path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssl_audio_tpu.config import Config, default_config, setup_model_defaults
from ssl_audio_tpu.train.optim import legacy_cosine_factor, make_legacy_optimizer
from ssl_audio_tpu.utils.schedules import cosine_scheduler


class TestLegacyCosineFactor:
    @pytest.mark.parametrize(
        "base,final,epochs,niter,warmup",
        [
            (5e-4, 1e-6, 40, 97, 6),     # dino.yaml lr shape
            (0.04, 0.4, 40, 97, 0),      # dino.yaml wd shape (increasing)
            (0.996, 1.0, 10, 13, 0),     # momentum shape
            (1.0, 0.1, 3, 1, 2),         # warmup_iters == 2 edge
            (1.0, 0.1, 2, 1, 1),         # warmup_iters == 1 edge (linspace num=1)
        ],
    )
    def test_matches_numpy_scheduler(self, base, final, epochs, niter, warmup):
        ref = cosine_scheduler(base, final, epochs, niter, warmup_epochs=warmup)
        fn = legacy_cosine_factor(base, final, epochs, niter, warmup_epochs=warmup)
        got = np.asarray(jax.vmap(fn)(jnp.arange(len(ref))))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)

    def test_clamps_past_budget(self):
        fn = legacy_cosine_factor(1.0, 0.25, 2, 4, warmup_epochs=0)
        assert float(fn(8)) == pytest.approx(0.25)
        assert float(fn(100)) == pytest.approx(0.25)


class TestMethodDefaults:
    def test_dino_recipe(self):
        cfg = default_config(method="dino", model_type="audiontt")
        assert cfg.optimizer == "AdamW"
        assert cfg.base_lr == 5.0e-4
        assert cfg.wd == 0.04 and cfg.final_wd == 0.4
        assert cfg.teacher_temp == 0.4 and cfg.warmup_teacher_temp == 0.04
        assert cfg.warmup_teacher_temp_epochs == 18
        assert cfg.momentum_teacher == 0.996
        assert cfg.dino_out_dim == 4096

    def test_byola_recipe(self):
        cfg = default_config(method="byola", model_type="audiontt")
        assert cfg.optimizer == "Adam"
        assert cfg.base_lr == 3.0e-4
        assert cfg.proj_size == 256 and cfg.proj_dim == 4096

    def test_explicit_values_win(self):
        cfg = default_config(method="dino", model_type="audiontt",
                             base_lr=1e-3, wd=0.1, final_wd=0.2)
        assert cfg.base_lr == 1e-3 and cfg.wd == 0.1 and cfg.final_wd == 0.2

    def test_method_recipe_beats_model_fill(self):
        # without a method, conv models get the BT LARS fill; with one,
        # the old-gen recipe wins (the reference's old trainers ignore
        # hyperparameters.py)
        assert default_config(model_type="audiontt").optimizer == "LARS"
        assert default_config(method="dino",
                              model_type="vit_base").optimizer == "AdamW"


class TestLegacyOptimizer:
    def _params(self):
        return {"w": jnp.full((3, 4), 2.0), "b": jnp.full((4,), 2.0)}

    def test_dino_adamw_schedules(self):
        cfg = default_config(method="dino", model_type="audiontt",
                            batch_size=256, epochs=4)
        niter = 5
        tx = make_legacy_optimizer(cfg, "dino", niter)
        params = self._params()
        st = tx.init(params)
        lr_ref = cosine_scheduler(5e-4 * 256 / 256, cfg.final_lr, 4, niter,
                                  warmup_epochs=cfg.warmup_epochs)
        wd_ref = cosine_scheduler(0.04, 0.4, 4, niter)
        zeros = jax.tree.map(jnp.zeros_like, params)
        for i in range(4):
            upd, st = tx.update(zeros, st, params)
            # zero grads => the adam term is exactly 0, so the update is
            # the decoupled weight-decay step -lr*wd*p for weights and 0
            # for 1-dim params (torch AdamW param-group split)
            exp = -lr_ref[i] * wd_ref[i] * 2.0
            np.testing.assert_allclose(np.asarray(upd["w"]), exp, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(upd["b"]), 0.0, atol=0)

    def test_dino_warmup_starts_at_zero_lr(self):
        cfg = default_config(method="dino", model_type="audiontt",
                            batch_size=256, epochs=4)
        tx = make_legacy_optimizer(cfg, "dino", 5)
        params = self._params()
        upd, _ = tx.update(jax.tree.map(jnp.zeros_like, params),
                           tx.init(params), params)
        # iteration 0 of a warmup schedule is lr=0 (linspace start)
        np.testing.assert_allclose(np.asarray(upd["w"]), 0.0, atol=0)

    def test_byola_constant_adam(self):
        cfg = default_config(method="byola", model_type="audiontt")
        tx = make_legacy_optimizer(cfg, "byola", 5)
        params = self._params()
        st = tx.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        upd, st = tx.update(g, st, params)
        # plain Adam, no weight decay: first-step update is -lr * g/|g|-ish,
        # identical for weights and biases
        ref = optax.adam(3e-4)
        upd2, _ = ref.update(g, ref.init(params), params)
        np.testing.assert_allclose(np.asarray(upd["w"]),
                                   np.asarray(upd2["w"]), rtol=1e-7)
        np.testing.assert_allclose(np.asarray(upd["b"]),
                                   np.asarray(upd2["b"]), rtol=1e-7)

    def test_unknown_method_raises(self):
        cfg = default_config(model_type="audiontt")
        with pytest.raises(ValueError):
            make_legacy_optimizer(cfg, "barlow", 5)


class TestLegacyHeadDims:
    def test_dino_head_reference_dims(self):
        from ssl_audio_tpu.train.legacy_steps import LegacyModules

        mods = LegacyModules(default_config(method="dino",
                                            model_type="audiontt"), "dino")
        assert mods.head.out_dim == 4096       # dino.yaml projection.out_dim
        assert mods.head.hidden_dim == 2048    # DINOHead class default
        assert mods.head.bottleneck_dim == 256

    def test_byola_head_reference_dims(self):
        from ssl_audio_tpu.train.legacy_steps import LegacyModules

        mods = LegacyModules(default_config(method="byola",
                                            model_type="audiontt"), "byola")
        assert mods.head.hidden_dim == 4096    # config.yaml proj_dim
        assert mods.head.out_dim == 256        # config.yaml proj_size
        assert mods.predictor.hidden_dim == 4096
        assert mods.predictor.out_dim == 256


class TestDinoYamlLoads:
    def test_reference_dino_yaml_unmodified(self):
        import os

        from ssl_audio_tpu.config import config_from_args

        path = "/root/reference/old/configs/pretrain/dino.yaml"
        if not os.path.exists(path):
            pytest.skip("reference tree not mounted")
        cfg = config_from_args(["--config", path, "--model_type", "audiontt"])
        assert cfg.teacher_temp == 0.4
        assert cfg.warmup_teacher_temp == 0.04
        assert cfg.warmup_teacher_temp_epochs == 18
        assert cfg.momentum_teacher == 0.996
        assert cfg.dino_out_dim == 4096       # model.projection.out_dim
        assert cfg.base_lr == 5.0e-4          # optimizer.base_lr (new slot)
        assert cfg.lr == 5.0e-4               # ...and the r3-tested alias
        assert cfg.final_lr == 1.0e-6
        assert cfg.wd == 0.04                 # optimizer.weight_decay
        assert cfg.final_wd == 0.4            # optimizer.final_weight_decay
        assert cfg.warmup_epochs == 6
        assert cfg.batch_size == 256 and cfg.epochs == 40
