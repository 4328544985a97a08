"""Evaluation stack tests: MLP classifier regimes, encode_vit unit splitting,
kNN monitor, low-shot subsets, end-to-end linear probe on synthetic data."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_audio_tpu.config import default_config
from ssl_audio_tpu.data.datasets import SyntheticLMS
from ssl_audio_tpu.data.pipeline import DataLoader
from ssl_audio_tpu.eval.encode import encode_vit, pad_to_unit_multiple
from ssl_audio_tpu.eval.knn import eval_knn, knn_predict
from ssl_audio_tpu.eval.linear import make_embedding_forward
from ssl_audio_tpu.eval.low_shot import low_shot_subsets
from ssl_audio_tpu.eval.mlp_clf import MLPClassifier


def blobs(rng, n_per_class, n_classes, d, spread=0.25):
    X, y = [], []
    for c in range(n_classes):
        center = rng.standard_normal(d)
        X.append(center + spread * rng.standard_normal((n_per_class, d)))
        y.append(np.full(n_per_class, c))
    return np.concatenate(X).astype(np.float32), np.concatenate(y)


class TestMLPClassifier:
    def test_single_label_acc(self, rng):
        X, y = blobs(rng, 60, 4, 16)
        Xt, yt = blobs(rng, 20, 4, 16)  # same generator continues: new centers!
        # use a train/test split of the SAME blobs instead
        idx = rng.permutation(len(X))
        tr, te = idx[:180], idx[180:]
        clf = MLPClassifier(hidden_layer_sizes=(32,), max_iter=300, early_stopping=True, n_iter_no_change=30)
        clf.fit(X[tr], y[tr])
        score = clf.score(X[te], y[te])
        assert score > 0.9, score

    def test_multi_label_map(self, rng):
        X, y = blobs(rng, 60, 4, 16)
        Y = np.eye(4, dtype=np.float32)[y]
        # add a second correlated label column block
        Y2 = np.concatenate([Y, Y[:, :2]], axis=1)  # 6 labels
        idx = rng.permutation(len(X))
        tr, te = idx[:180], idx[180:]
        clf = MLPClassifier(hidden_layer_sizes=(32,), max_iter=300, early_stopping=True, n_iter_no_change=30)
        clf.fit(X[tr], Y2[tr])
        assert clf.multi_label
        score = clf.score(X[te], Y2[te])
        assert score > 0.9, score  # mAP

    def test_early_stopping_restores_best(self, rng):
        X, y = blobs(rng, 30, 3, 8)
        clf = MLPClassifier(hidden_layer_sizes=(16,), max_iter=100,
                            early_stopping=True, n_iter_no_change=3)
        clf.fit(X, y)
        assert clf.params is not None and clf.best_val > 0


class TestEncodeVit:
    def test_pad_to_unit(self):
        x = jnp.zeros((2, 1, 64, 100))
        out = pad_to_unit_multiple(x, 96)
        assert out.shape[-1] == 192
        # reference quirk: exact multiples STILL get one extra unit of padding
        out2 = pad_to_unit_multiple(jnp.zeros((2, 1, 64, 96)), 96)
        assert out2.shape[-1] == 192

    def test_encode_vit_cls_mean(self, rng):
        """Unit-splitting must average per-unit CLS embeddings."""
        from ssl_audio_tpu.models import get_mae_vit

        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 96 * 2)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x[..., :96], train=False)

        def apply_fn(xu, return_all):
            return model.apply(variables, xu, train=False, return_all=return_all)

        out = encode_vit(apply_fn, x, unit_frames=96, use_cls=True,
                         patch_fbins=4, embed_d=192)
        assert out.shape == (2, 192)
        # manual: 2 full units + 1 padded unit (pad quirk) averaged
        u1 = apply_fn(x[..., :96], False)
        u2 = apply_fn(x[..., 96:], False)
        u3 = apply_fn(jnp.zeros_like(x[..., :96]), False)
        manual = (u1 + u2 + u3) / 3
        np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-5)

    def test_encode_vit_dense(self, rng):
        from ssl_audio_tpu.models import get_mae_vit

        model = get_mae_vit("tiny")
        x = jnp.asarray(rng.standard_normal((2, 1, 64, 100)).astype(np.float32))
        variables = model.init({"params": jax.random.key(0)}, x[..., :96], train=False)

        def apply_fn(xu, return_all):
            return model.apply(variables, xu, train=False, return_all=return_all)

        out = encode_vit(apply_fn, x, unit_frames=96, use_cls=False,
                         patch_fbins=4, embed_d=192)
        assert out.shape == (2, 4 * 192)


class TestKNN:
    def test_knn_predict_separable(self, rng):
        X, y = blobs(rng, 50, 3, 8, spread=0.1)
        scores = np.asarray(knn_predict(
            jnp.asarray(X[:10]), jnp.asarray(X), jnp.asarray(y.astype(np.int32)),
            n_classes=3, k=20,
        ))
        assert (scores.argmax(-1) == y[:10]).all()

    def test_eval_knn_loader(self, rng):
        X, y = blobs(rng, 40, 3, 8, spread=0.1)

        def loader(X, y, bs=32):
            for i in range(0, len(X), bs):
                yield X[i : i + bs], y[i : i + bs]

        forward = lambda x: x  # identity embedding  # noqa: E731
        top1, top5 = eval_knn(forward, loader(X, y), loader(X[:30], y[:30]), 3)
        assert top1 > 95.0
        assert top5 == 100.0


class TestLowShot:
    def test_disjoint_subsets(self):
        y = np.eye(4, dtype=np.float32)[np.arange(40) % 4]
        s1, s2, s3 = low_shot_subsets(y, n=3)
        assert len(set(s1) & set(s2)) == 0
        assert len(set(s2) & set(s3)) == 0
        assert len(s1) == 12  # 3 per class x 4 classes


class TestLinearEndToEnd:
    def test_probe_on_synthetic_encoder(self):
        """Embedding forward + probe on the class-structured synthetic set."""
        cfg = default_config(model_type="audiontt", batch_size=16,
                             projector_hidden_dim=32, projector_out_dim=8)
        from ssl_audio_tpu.train.state import init_train_state

        mods, state = init_train_state(cfg, jax.random.key(0))
        forward = make_embedding_forward(
            cfg, mods, jax.device_get(state.params), jax.device_get(state.batch_stats)
        )
        ds = SyntheticLMS(cfg, length=160, n_classes=4)
        dl = DataLoader(ds, batch_size=16, shuffle=False, drop_last=False, num_workers=2)
        from ssl_audio_tpu.eval.encode import extract_embeddings

        X, Y = extract_embeddings(forward, dl)
        assert X.shape == (160, 3072)
        clf = MLPClassifier(hidden_layer_sizes=(64,), max_iter=30, early_stopping=True)
        clf.fit(X[:128], Y[:128])
        score = clf.score(X[128:], Y[128:])
        # random-init encoder on strongly class-structured data: mAP >> chance
        assert score > 0.5, score


    def test_vit_embedding_forward(self):
        """ViT path of make_embedding_forward (the linear.py probe): the
        unit-splitter's return_all bool must be a STATIC jit arg — a traced
        bool raised TracerBoolConversionError (latent until the first ViT
        probe run through tools/reproduce.py, fixed r3).  Covers both the
        CLS and the dense-token (use_cls=False) branches."""
        from ssl_audio_tpu.train.state import init_train_state

        for use_cls, dim in ((True, 192), (False, 4 * 192)):
            cfg = default_config(model_type="vit_tiny", batch_size=8,
                                 use_cls=use_cls,
                                 projector_hidden_dim=32, projector_out_dim=8,
                                 mixup_n_memory=16)
            mods, state = init_train_state(cfg, jax.random.key(0))
            fwd = make_embedding_forward(
                cfg, mods, jax.device_get(state.params),
                jax.device_get(state.batch_stats))
            x = jnp.asarray(np.random.default_rng(0)
                            .standard_normal((2, 1, 64, 96)).astype(np.float32))
            out = fwd(x)
            assert out.shape == (2, dim) and np.isfinite(np.asarray(out)).all()


class TestEvalPrecisionAndPool:
    def test_bf16_eval_forward(self):
        cfg = default_config(model_type="audiontt", batch_size=8, use_fp16_eval=True,
                             projector_hidden_dim=32, projector_out_dim=8)
        from ssl_audio_tpu.train.state import init_train_state

        mods, state = init_train_state(cfg, jax.random.key(0))
        fwd = make_embedding_forward(
            cfg, mods, jax.device_get(state.params), jax.device_get(state.batch_stats)
        )
        x = jnp.zeros((2, 1, 64, 96), jnp.float32)
        out = fwd(x)
        assert out.dtype == jnp.float32 and out.shape == (2, 3072)

    def test_mean_pool_flows_into_training(self, rng):
        cfg = default_config(model_type="vit_tiny", batch_size=8, use_mean_pool=True,
                             projector_hidden_dim=32, projector_out_dim=8,
                             mixup_n_memory=16)
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.train.steps import make_train_step

        mods, state = init_train_state(cfg, jax.random.key(0))
        assert mods.encoder_kwargs()["mean_pool"] is True
        step = make_train_step(mods, donate=False)
        batch = jnp.asarray(np.random.default_rng(0).standard_normal((8, 1, 64, 96)).astype(np.float32))
        state, m = step(state, batch, jax.random.key(1), 0.0)
        assert np.isfinite(float(m["loss"]))


class TestEncoderGraftLoad:
    def test_dino_checkpoint_loads_into_eval_state(self, tmp_path):
        """load_encoder_checkpoint grafts a legacy DINO checkpoint's encoder
        into the BT-shaped eval state (the reference's old/evaluate loads
        only the backbone) — a full-template restore fails on the DINOHead
        and target_* trees.  Found by the r5 CLI drive sweep."""
        import jax
        import numpy as np

        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.train.legacy_steps import init_legacy_state
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.utils import checkpoint as ckpt_lib

        cfg = default_config(
            method="dino", dataset="synthetic", model_type="audiontt",
            batch_size=4, projector_hidden_dim=32, projector_out_dim=8,
            mixup_n_memory=8, dino_out_dim=16, epochs=1, num_workers=0,
            no_eval=True)
        _, legacy_state = init_legacy_state(cfg, jax.random.key(0), "dino")
        path = str(tmp_path / "model_1")
        ckpt_lib.save_checkpoint(path, jax.device_get(legacy_state), 1)

        cfg_eval = cfg.replace(optimizer=None, lr=None, wd=None)
        from ssl_audio_tpu.config import setup_model_defaults

        cfg_eval = setup_model_defaults(cfg_eval)
        _, eval_state = init_train_state(cfg_eval, jax.random.key(1))
        grafted = ckpt_lib.load_encoder_checkpoint(
            path, jax.device_get(eval_state))
        want = jax.tree.leaves(legacy_state.params["encoder"])
        got = jax.tree.leaves(grafted.params["encoder"])
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the BT head stays the eval init (not overwritten by DINOHead)
        assert set(grafted.params) == set(eval_state.params)

    def test_mismatched_encoder_raises(self, tmp_path):
        import jax
        import pytest as _pytest

        from ssl_audio_tpu.config import default_config
        from ssl_audio_tpu.train.state import init_train_state
        from ssl_audio_tpu.utils import checkpoint as ckpt_lib

        cfg_a = default_config(
            dataset="synthetic", model_type="audiontt", batch_size=4,
            projector_hidden_dim=32, projector_out_dim=8, mixup_n_memory=8,
            epochs=1, num_workers=0, no_eval=True)
        _, st_a = init_train_state(cfg_a, jax.random.key(0))
        path = str(tmp_path / "model_1")
        ckpt_lib.save_checkpoint(path, jax.device_get(st_a), 1)

        cfg_b = cfg_a.replace(model_type="vit_tiny", optimizer=None,
                              lr=None, wd=None)
        from ssl_audio_tpu.config import setup_model_defaults

        cfg_b = setup_model_defaults(cfg_b)
        _, st_b = init_train_state(cfg_b, jax.random.key(1))
        with _pytest.raises(ValueError, match="does not match"):
            ckpt_lib.load_encoder_checkpoint(path, jax.device_get(st_b))
