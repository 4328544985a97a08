"""sklearn-style MLP classifier in JAX (reference utils/torch_mlp_clf.py).

Same contract as TorchMLPClassifier: StandardScaler on features, automatic
single-label (CrossEntropy + accuracy) vs multi-label (BCE + mAP) regime from
y.ndim (torch_mlp_clf.py:279-286), Adam(lr=1e-3, wd=alpha), batch 200,
early stopping with best-weights restore (torch_mlp_clf.py:103-132)."""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _sigmoid(x: np.ndarray) -> np.ndarray:
    from scipy.special import expit

    return expit(x)


def average_precision(targets: np.ndarray, scores: np.ndarray) -> float:
    """Macro-averaged AP (sklearn.average_precision_score equivalent)."""
    from sklearn.metrics import average_precision_score

    return float(average_precision_score(targets, scores))


class _ScalerState:
    def __init__(self, X: np.ndarray):
        self.mean = X.mean(axis=0)
        self.std = X.std(axis=0)
        self.std[self.std == 0] = 1.0

    def __call__(self, X: np.ndarray) -> np.ndarray:
        return ((X - self.mean) / self.std).astype(np.float32)


def _init_mlp(rng, sizes):
    params = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for k, (i, o) in zip(keys, zip(sizes[:-1], sizes[1:])):
        # torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))
        bound = 1.0 / np.sqrt(i)
        w = jax.random.uniform(k, (i, o), minval=-bound, maxval=bound)
        b = jax.random.uniform(jax.random.fold_in(k, 1), (o,), minval=-bound, maxval=bound)
        params.append({"w": w, "b": b})
    return params


def _mlp_forward(params, x):
    for layer in params[:-1]:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
    last = params[-1]
    return x @ last["w"] + last["b"]


class MLPClassifier:
    def __init__(
        self,
        hidden_layer_sizes=(100,),
        alpha: float = 1e-8,
        batch_size="auto",
        learning_rate_init: float = 1e-3,
        max_iter: int = 200,
        random_state: Optional[int] = None,
        early_stopping: bool = False,
        validation_fraction: float = 0.1,
        n_iter_no_change: int = 10,
        scaling: bool = True,
        debug: bool = False,
    ):
        self.hidden_layer_sizes = tuple(hidden_layer_sizes)
        self.alpha = alpha
        self.batch_size = batch_size
        self.lr = learning_rate_init
        self.max_iter = max_iter
        self.random_state = random_state or 0
        self.early_stopping = early_stopping
        self.validation_fraction = validation_fraction
        self.patience = n_iter_no_change
        self.scaling = scaling
        self.debug = debug
        self.params = None
        self.multi_label = False

    # ------------------------------------------------------------------
    def _regime(self, y: np.ndarray):
        if y.ndim == 2:
            return "mAP", y.shape[1], True
        if y.ndim == 1:
            return "acc", len(set(y.tolist())), False
        raise ValueError(f"Unsupported shape of y: {y.shape}")

    def fit(self, X, y, X_val=None, y_val=None):
        X, y = np.asarray(X, np.float32), np.asarray(y)
        metric, n_class, multi = self._regime(y)
        self.multi_label = multi
        self.n_class = n_class

        if self.scaling:
            self.scaler = _ScalerState(X)
            X = self.scaler(X)
        if X_val is not None:
            X_val = self.scaler(np.asarray(X_val, np.float32)) if self.scaling else X_val
            y_val = np.asarray(y_val)
        else:
            rng = np.random.default_rng(self.random_state)
            n_val = max(1, int(len(X) * self.validation_fraction))
            idx = rng.permutation(len(X))
            X, X_val = X[idx[n_val:]], X[idx[:n_val]]
            y, y_val = y[idx[n_val:]], y[idx[:n_val]]

        bs = min(200, len(X)) if self.batch_size == "auto" else self.batch_size
        sizes = [X.shape[-1], *self.hidden_layer_sizes, n_class]
        params = _init_mlp(jax.random.key(self.random_state), sizes)
        tx = optax.chain(
            optax.add_decayed_weights(self.alpha),
            optax.adam(self.lr),
        )
        opt_state = tx.init(params)

        if multi:
            def loss_fn(params, xb, yb):
                logits = _mlp_forward(params, xb)
                return optax.sigmoid_binary_cross_entropy(logits, yb).mean()
        else:
            def loss_fn(params, xb, yb):
                logits = _mlp_forward(params, xb)
                return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

        @jax.jit
        def train_step(params, opt_state, xb, yb):
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        predict = jax.jit(_mlp_forward)

        rng = np.random.default_rng(self.random_state)
        y_dev = y.astype(np.float32) if multi else y.astype(np.int32)
        best_val, best_params, wait = -np.inf, params, 0
        for epoch in range(self.max_iter):
            order = rng.permutation(len(X))
            for b0 in range(0, len(X), bs):
                sel = order[b0 : b0 + bs]
                params, opt_state, _ = train_step(
                    params, opt_state, jnp.asarray(X[sel]), jnp.asarray(y_dev[sel])
                )
            val = self._metric_value(predict, params, X_val, y_val, multi)
            if self.debug:
                print(f"epoch {epoch+1}/{self.max_iter} val_{metric}={val:.5f}")
            if val >= best_val:
                best_val, best_params, wait = val, params, 1
            else:
                if wait >= self.patience and self.early_stopping:
                    break
                wait += 1
        self.params = jax.device_get(best_params)
        self.best_val = best_val
        return self

    # ------------------------------------------------------------------
    def _metric_value(self, predict, params, X, y, multi) -> float:
        logits = np.asarray(predict(params, jnp.asarray(X)))
        if multi:
            return average_precision(y, _sigmoid(logits))
        return float((logits.argmax(-1) == y).mean())

    def predict_proba(self, X) -> np.ndarray:
        X = self.scaler(np.asarray(X, np.float32)) if self.scaling else np.asarray(X)
        logits = np.asarray(_mlp_forward(self.params, jnp.asarray(X)))
        if self.multi_label:
            return _sigmoid(logits)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def score(self, X, y) -> float:
        y = np.asarray(y)
        proba = self.predict_proba(X)
        if y.ndim == 2:
            return average_precision(y, proba)
        return float((proba.argmax(-1) == y).mean())
