"""Linear probe evaluation (reference linear.py + main.py:198-237 eval_linear).

Pipeline: extract embeddings for train/val/test (ViTs go through the batched
96-frame unit splitter), fit the MLP classifier, score (acc or mAP), and run
the n=5 low-shot protocol."""
from __future__ import annotations

import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssl_audio_tpu.data import datasets as D
from ssl_audio_tpu.data.pipeline import DataLoader
from ssl_audio_tpu.eval.encode import encode_vit, extract_embeddings
from ssl_audio_tpu.eval.low_shot import eval_linear_low_shot
from ssl_audio_tpu.eval.mlp_clf import MLPClassifier
from ssl_audio_tpu.models.wrapper import is_vit


def make_embedding_forward(cfg, mods, params, batch_stats) -> Callable:
    """Jitted (B, 1, F, T) -> (B, D) embedding function for any encoder.

    ViTs: per-96-frame-unit CLS, averaged (reference utils.py:278-314);
    conv encoders: direct pooled forward."""
    enc_params = params["encoder"]
    compute_dtype = jnp.bfloat16 if cfg.use_fp16_eval else None
    if compute_dtype is not None:
        # --use_fp16_eval: bfloat16 embedding extraction (reference uses AMP
        # for eval when set, main.py:199-203)
        enc_params = jax.tree.map(lambda p: p.astype(compute_dtype), enc_params)

    def _cast_in(x):
        return x.astype(compute_dtype) if compute_dtype is not None else x

    def _cast_out(x):
        return x.astype(jnp.float32) if compute_dtype is not None else x

    if is_vit(cfg):
        unit_frames = cfg.crop_frames

        # return_all selects the CLS-vs-dense-token return path inside the
        # encoder (a Python branch) — it must be a STATIC jit argument, not
        # a traced bool
        @functools.partial(jax.jit, static_argnums=(1,))
        def unit_apply(xu, return_all):
            variables = {"params": enc_params}
            if batch_stats.get("encoder"):
                variables["batch_stats"] = batch_stats["encoder"]
            return _cast_out(mods.encoder.apply(
                variables, _cast_in(xu), train=False, return_all=return_all
            ))

        def forward(x):
            return encode_vit(
                lambda xu, ra: unit_apply(xu, ra),
                x,
                unit_frames=unit_frames,
                use_cls=cfg.use_cls,
                patch_fbins=mods.encoder.grid_size()[0],
                embed_d=mods.encoder.embed_dim,
            )

        return forward

    @jax.jit
    def forward(x):
        variables = {"params": enc_params}
        if batch_stats.get("encoder"):
            variables["batch_stats"] = batch_stats["encoder"]
        return _cast_out(mods.encoder.apply(variables, _cast_in(x), train=False))

    return forward


def eval_linear(
    forward: Callable,
    train_loader,
    val_loader,
    test_loader,
    max_iter: int = 500,
    low_shot: bool = True,
) -> dict:
    """reference main.py:198-237."""
    print("Extracting embeddings")
    t0 = time.time()
    X_train, y_train = extract_embeddings(forward, train_loader)
    X_val, y_val = extract_embeddings(forward, val_loader)
    X_test, y_test = extract_embeddings(forward, test_loader)
    print(f"Done\tTime elapsed = {time.time() - t0:.2f}s")

    print("Fitting linear classifier")
    t0 = time.time()
    clf = MLPClassifier(
        hidden_layer_sizes=(1024,),
        max_iter=max_iter,
        early_stopping=True,
        n_iter_no_change=20,
    )
    clf.fit(X_train, y_train, X_val=X_val, y_val=y_val)
    score_all = clf.score(X_test, y_test)
    print(f"Done\tTime elapsed = {time.time() - t0:.2f}s")

    results = {"score_all": score_all}
    if low_shot:
        print("Performing linear evaluation with 5 examples per class")
        results["score_5"] = eval_linear_low_shot(
            X_train, y_train, X_val, y_val, X_test, y_test, n=5, max_iter=max_iter
        )
    return results


def get_fsd50k_eval_loaders(cfg, data_dir="data", crop_frames=711):
    """reference main.py:240-254 (eval loaders with 711-frame crops)."""
    norm = D.NORM_STATS["fsd50k"]
    mk = functools.partial(
        DataLoader, batch_size=cfg.batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.num_workers,
    )
    return (
        mk(D.FSD50K(cfg, split="train", norm_stats=norm, crop_frames=crop_frames,
                    data_dir=data_dir)),
        mk(D.FSD50K(cfg, split="val", norm_stats=norm, crop_frames=crop_frames,
                    data_dir=data_dir)),
        mk(D.FSD50K(cfg, split="test", norm_stats=norm, crop_frames=crop_frames,
                    data_dir=data_dir)),
    )


def make_epoch_eval_fn(cfg, data_dir="data", wandb_run=None):
    """Per-epoch FSD50K probe hook (reference main.py:497-519)."""
    loaders = get_fsd50k_eval_loaders(cfg, data_dir)

    def eval_fn(mods, state, epoch):
        params = jax.device_get(state.params)
        batch_stats = jax.device_get(state.batch_stats)
        forward = make_embedding_forward(cfg, mods, params, batch_stats)
        scores = eval_linear(forward, *loaders)
        if state.target_params is not None:
            # BYOL variant: the reference probes the target (teacher) encoder
            # too (main_bt_byol.py:519-527)
            t_forward = make_embedding_forward(
                cfg, mods,
                jax.device_get(state.target_params),
                jax.device_get(state.target_batch_stats),
            )
            t_scores = eval_linear(t_forward, *loaders, low_shot=False)
            scores["teacher_score_all"] = t_scores["score_all"]
        if wandb_run is not None:
            wandb_run.log({
                "FSD50K score (100%)": scores["score_all"],
                "FSD50K score (5pC) (mean)": scores.get("score_5", (None,))[0],
            })
        return scores

    return eval_fn
