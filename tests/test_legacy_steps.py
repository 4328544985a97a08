"""DINO / BYOL-A training steps + method-dispatch entry + kNN mAP +
forward_viz."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.train.legacy_steps import (
    init_legacy_state,
    make_byola_train_step,
    make_dino_train_step,
)


def tiny_cfg(**kw):
    base = dict(
        dataset="synthetic", model_type="audiontt", batch_size=8,
        projector_hidden_dim=64, projector_out_dim=16, mixup_n_memory=16,
        dino_out_dim=16, proj_size=16, proj_dim=64,
        synthetic_steps_per_epoch=2, epochs=1, num_workers=2, no_eval=True,
    )
    base.update(kw)
    return default_config(**base)


def batch(rng, b=8):
    return jnp.asarray(rng.standard_normal((b, 1, 64, 96)).astype(np.float32))


class TestDinoStep:
    def test_loss_finite_center_updates(self, rng):
        # warmup_epochs=0: the faithful recipe's iteration-0 lr is exactly 0
        # (linspace warmup start, old/utils/utils.py:62-74), which would make
        # the one-step teacher-trails-student assertion vacuous
        cfg = tiny_cfg(warmup_epochs=0)
        mods, state = init_legacy_state(cfg, jax.random.key(0), "dino")
        step = make_dino_train_step(mods)
        c0 = np.asarray(state.extra["center"]).copy()
        state, m = step(state, batch(rng), jax.random.key(1),
                        np.float32(0.04), np.float32(0.996))
        assert np.isfinite(float(m["loss"]))
        assert not np.allclose(np.asarray(state.extra["center"]), c0)
        # teacher trails the student after the EMA update
        t = np.asarray(jax.tree.leaves(state.target_params["encoder"])[0])
        s = np.asarray(jax.tree.leaves(state.params["encoder"])[0])
        assert not np.allclose(t, s)

    def test_multi_crop_dino(self, rng):
        cfg = tiny_cfg(model_type="vit_tiny", local_crops_number=2)
        mods, state = init_legacy_state(cfg, jax.random.key(0), "dino")
        step = make_dino_train_step(mods)
        state, m = step(state, batch(rng), jax.random.key(1),
                        np.float32(0.04), np.float32(0.996))
        assert np.isfinite(float(m["loss"]))


class TestDinoLossParity:
    def test_matches_torch_dino_loss(self, rng):
        """Value parity of dino_loss against a torch oracle that replicates
        DINOLoss.forward + update_center verbatim
        (reference old/methods/dino.py:332-388): student log-softmax over
        ncrops chunks, teacher centered/sharpened softmax over 2 chunks,
        same-index pairs skipped, center EMA over the teacher batch mean."""
        import torch
        import torch.nn.functional as F

        from ssl_audio_tpu.objectives.dino import dino_loss

        B, D, ncrops = 8, 16, 4
        student_temp, center_momentum, temp = 0.1, 0.9, 0.04
        student = rng.standard_normal((ncrops * B, D)).astype(np.float32)
        teacher = rng.standard_normal((2 * B, D)).astype(np.float32)
        center = rng.standard_normal((1, D)).astype(np.float32)

        # ---- torch oracle (dino.py:350-388, world_size=1) -----------------
        s_t = torch.from_numpy(student) / student_temp
        s_chunks = s_t.chunk(ncrops)
        t_out = F.softmax((torch.from_numpy(teacher) - torch.from_numpy(center)) / temp,
                          dim=-1).detach().chunk(2)
        total, n_terms = 0.0, 0
        for iq, q in enumerate(t_out):
            for v in range(len(s_chunks)):
                if v == iq:
                    continue
                total = total + torch.sum(-q * F.log_softmax(s_chunks[v], dim=-1),
                                          dim=-1).mean()
                n_terms += 1
        ref_loss = float(total / n_terms)
        bc = torch.from_numpy(teacher).sum(dim=0, keepdim=True) / (2 * B)
        ref_center = (torch.from_numpy(center) * center_momentum
                      + bc * (1 - center_momentum)).numpy()

        # ---- ours ----------------------------------------------------------
        s_views = [jnp.asarray(c) for c in np.split(student, ncrops)]
        t_views = [jnp.asarray(c) for c in np.split(teacher, 2)]
        loss, new_center = dino_loss(
            s_views, t_views, jnp.asarray(center), teacher_temp=temp,
            student_temp=student_temp, center_momentum=center_momentum,
        )
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_center), ref_center, rtol=1e-5,
                                   atol=1e-7)


class TestByolaStep:
    def test_loss_decreases_target_trails(self, rng):
        cfg = tiny_cfg(moving_average_decay=0.9)
        mods, state = init_legacy_state(cfg, jax.random.key(0), "byola")
        step = make_byola_train_step(mods)
        b = batch(rng)
        losses = []
        for i in range(4):
            state, m = step(state, b, jax.random.fold_in(jax.random.key(1), i),
                            np.float32(0.0))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestMethodDispatch:
    def test_dino_entry(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import main_pretrain

        main_pretrain.main([
            "--method", "dino", "--dataset", "synthetic", "--model_type",
            "audiontt", "--epochs", "1", "--batch_size", "8",
            "--synthetic_steps_per_epoch", "2", "--no_eval",
            "--projector_hidden_dim", "64", "--projector_out_dim", "16",
            "--num_workers", "2",
        ])
        assert (tmp_path / "results/synthetic/dino_audiontt").exists()

    def test_byola_entry(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import main_pretrain

        main_pretrain.main([
            "--method", "byola", "--dataset", "synthetic", "--model_type",
            "audiontt", "--epochs", "1", "--batch_size", "8",
            "--synthetic_steps_per_epoch", "2", "--no_eval",
            "--projector_hidden_dim", "64", "--projector_out_dim", "16",
            "--num_workers", "2",
        ])


class TestKnnMap:
    def test_separable(self, rng):
        from ssl_audio_tpu.eval.knn import knn_map

        X = np.concatenate([
            rng.standard_normal((40, 8)) + 4 * np.eye(8)[c % 8]
            for c in range(3) for _ in [0]
        ]).astype(np.float32)
        Y = np.concatenate([np.tile(np.eye(3)[c], (40, 1)) for c in range(3)]).astype(np.float32)
        score = knn_map(X[:30], Y[:30], X, Y, k=20)
        assert score > 0.9


class TestForwardViz:
    def test_recon_viz(self, rng):
        from ssl_audio_tpu.models import get_mae_vit

        model = get_mae_vit("tiny", use_decoder=True)
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                               x, train=False, masked_recon=True, mask_ratio=0.75)
        loss, recons, errmap, mask = model.apply(
            variables, x, mask_ratio=0.75, train=False,
            rngs={"mask": jax.random.key(2)}, method=model.forward_viz,
        )
        assert recons.shape == x.shape and errmap.shape == x.shape
        assert mask.shape == (2, 4, 6)
        # visible patches are copied verbatim from the input
        m = np.asarray(mask)
        r = np.asarray(recons)
        xi = np.asarray(x)
        for i in range(4):
            for j in range(6):
                if m[0, i, j] == 0:
                    np.testing.assert_allclose(
                        r[0, 0, i*16:(i+1)*16, j*16:(j+1)*16],
                        xi[0, 0, i*16:(i+1)*16, j*16:(j+1)*16], atol=1e-6,
                    )


class TestLegacyFp16:
    def test_byola_bf16_matches_fp32(self, rng):
        """--use_fp16 legacy encoder forward (AMP-style bfloat16, fp32
        master params — train/legacy_steps.py encoder_fwd) must produce a
        finite loss close to the fp32 step's."""
        b = batch(rng)
        losses = {}
        for fp16 in (False, True):
            cfg = tiny_cfg(use_fp16=fp16)
            mods, state = init_legacy_state(cfg, jax.random.key(0), "byola")
            step = make_byola_train_step(mods)
            _, m = step(state, b, jax.random.key(1), np.float32(0.0))
            losses[fp16] = float(m["loss"])
        assert np.isfinite(losses[True])
        assert abs(losses[True] - losses[False]) <= 0.05 * abs(losses[False])
