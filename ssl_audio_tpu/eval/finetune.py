"""Supervised linear-eval / finetune trainers on labeled audio
(reference old/evaluate/linear.py LinearTrainer and finetune.py
FinetuneTrainer): classifier head on a (frozen or trainable) encoder,
BCE multi-label objective, optional mixup + SpecAugment, mAP via
calculate_stats."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssl_audio_tpu.augment import spec_augment
from ssl_audio_tpu.eval.stats import mean_average_precision


def train_classifier(
    mods,
    params,
    batch_stats,
    train_loader,
    val_loader,
    n_classes: int,
    epochs: int = 10,
    lr: float = 1e-3,
    finetune: bool = False,
    mixup_alpha: Optional[float] = 0.2,
    specaug: bool = False,
    seed: int = 0,
    single_label: bool = False,
):
    """Returns (head_params, [encoder_params], best_val_mAP_or_acc).

    finetune=False: frozen encoder + linear head (LinearTrainer);
    finetune=True: encoder trains too (FinetuneTrainer) with mixup/SpecAugment
    eval-transforms as in the reference."""
    D = mods.feature_dim
    key = jax.random.key(seed)
    k_head, key = jax.random.split(key)
    bound = 1.0 / np.sqrt(D)
    head = {
        "w": jax.random.uniform(k_head, (D, n_classes), minval=-bound, maxval=bound),
        "b": jnp.zeros((n_classes,)),
    }

    if finetune:
        trainable = {"head": head, "encoder": params["encoder"]}
    else:
        trainable = {"head": head}
    tx = optax.adam(lr)
    opt_state = tx.init(trainable)
    enc_frozen = params["encoder"]
    # FinetuneTrainer semantics (old/evaluate/finetune.py): the encoder is in
    # train mode during finetune steps — BN running stats update and dropout is
    # live — and in eval mode for prediction. LinearTrainer keeps it frozen in
    # eval mode throughout. BN state is carried explicitly through the jitted
    # step (flax mutable collections replace torch's in-module buffers).
    enc_bs = batch_stats["encoder"]

    def forward(trainable, enc_bs, x, train, rngs=None):
        enc_params = trainable.get("encoder", enc_frozen)
        feat, new_bs = mods.apply_encoder(enc_params, enc_bs, x, train=train, rngs=rngs)
        return feat @ trainable["head"]["w"] + trainable["head"]["b"], new_bs

    def loss_fn(trainable, enc_bs, x, y, key):
        rngs = {"dropout": key, "droppath": key, "mask": key} if finetune else None
        logits, new_bs = forward(trainable, enc_bs, x, train=finetune, rngs=rngs)
        if single_label:
            loss = optax.softmax_cross_entropy(logits, y).mean()
        else:
            loss = optax.sigmoid_binary_cross_entropy(logits, y).mean()
        return loss, new_bs

    @jax.jit
    def step(trainable, enc_bs, opt_state, key, x, y):
        if mixup_alpha:
            k1, key = jax.random.split(key)
            x, y = spec_augment.mixup_batch(k1, x, y, mixup_alpha)
        if specaug:
            k2, k3, key = jax.random.split(key, 3)
            x = spec_augment.freq_mask(k2, x)
            x = spec_augment.time_mask(k3, x)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, enc_bs, x, y, key
        )
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), new_bs, opt_state, loss

    @jax.jit
    def predict(trainable, enc_bs, x):
        return forward(trainable, enc_bs, x, train=False)[0]

    def evaluate(trainable, enc_bs):
        outs, tgts = [], []
        for x, y in val_loader:
            logits = np.asarray(predict(trainable, enc_bs, jnp.asarray(x)))
            outs.append(logits)
            tgts.append(np.asarray(y))
        out, tgt = np.concatenate(outs), np.concatenate(tgts)
        if single_label:
            return float((out.argmax(-1) == tgt.argmax(-1)).mean())
        return mean_average_precision(1 / (1 + np.exp(-out)), tgt)

    best = -np.inf
    best_trainable = trainable
    for epoch in range(epochs):
        for x, y in train_loader:
            key, k = jax.random.split(key)
            trainable, enc_bs, opt_state, loss = step(
                trainable, enc_bs, opt_state, k, jnp.asarray(x), jnp.asarray(y)
            )
        score = evaluate(trainable, enc_bs)
        if score >= best:
            best = score
            best_trainable = jax.device_get(trainable)
            if finetune:
                best_trainable = dict(best_trainable,
                                      encoder_batch_stats=jax.device_get(enc_bs))
        print(f"[{'finetune' if finetune else 'linear'}] epoch {epoch+1}/{epochs} "
              f"val={'acc' if single_label else 'mAP'} {score:.4f}")
    return best_trainable, best
