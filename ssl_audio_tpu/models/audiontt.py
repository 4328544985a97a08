"""AudioNTT2022 encoder (BYOL-A v2 CNN) — the flagship conv encoder
(reference model.py:130-210).

Layout is NHWC internally (TPU-native channels-last convs); the public
interface takes the reference's (B, 1, n_mels, T) NCHW batches.

Architecture (n_mels=64, d=3072):
  2 x [Conv3x3(64) - BN - ReLU - MaxPool2x2 (- SE)]          -> (B, 16, T/4, 64)
  per-timeframe flatten (mel x ch = 1024)
  FC: 1024 -> 2048 -> ReLU -> Dropout(0.3) -> 2048 -> ReLU
  stack conv features with FC features -> (B, T/4, 3072)
  mean+max pooling over time                                  -> (B, 3072)
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree ({kernel, bias}) so the
    fused-kernel path keeps checkpoint/torch-import compatibility."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _BNParams(nn.Module):
    """Parameter/stat holder matching nn.BatchNorm's tree ({scale, bias} +
    batch_stats {mean, var})."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        return scale, bias, ra_mean, ra_var


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference model.py:194-210); NHWC input."""

    r: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))                               # (B, C)
        y = nn.Dense(c // self.r, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


def mean_max_pooling(frames: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, D): max-over-time + mean-over-time
    (reference model.py:186-191)."""
    return frames.max(axis=1) + frames.mean(axis=1)


class AudioNTT2022Encoder(nn.Module):
    n_mels: int = 64
    d: int = 3072
    base_d: int = 64
    mlp_hidden_d: int = 2048
    conv_layers: int = 2
    stack: bool = True
    squeeze_excitation: bool = False
    # Pallas fused conv-block for layer 0 (ops/fused_conv.py): never
    # materializes the (B, F, T, base_d) activation XLA round-trips ~5x
    # (PERF.md r3 trace: ~14.4 of 26.2 ms fp32 at B=256)
    fused_conv: bool = False
    # Eval-mode (running-stats) fused forward: measured SLOWER end-to-end on
    # the HEAR conv timestamp surface through the remote tunnel (7.0 vs 10.6
    # clips/s, PERF.md 2026-08-17) — XLA's forward-only composition has far
    # fewer HBM round-trips than training, so the kernel's traffic win
    # doesn't cover the X16 build there.  Opt-in only.
    fused_conv_eval: bool = False
    # Monotone pool-reorder for the TRAINING blocks the Pallas kernel
    # doesn't take (any Cin — i.e. block 2): pool(relu(bn(y))) ==
    # relu(bn(sign_aware_pool(y))) because the BN affine + ReLU are monotone
    # in y with direction sign(gamma), so the normalize/ReLU epilogue and
    # their backward run on the 4x-smaller pooled tensor.  Batch stats still
    # reduce over the full conv output; gradient routing is bit-identical
    # (select-and-scatter first-extreme on y picks the same window element
    # flax's pool-on-relu(z) picks, and the relu' masks coincide — ties in z
    # are ties in y at the same positions, and all-negative windows get zero
    # gradient either way).  A full block-2 Pallas kernel was rejected by
    # arithmetic: with Cin=64 the X16 view build is a 16x input-byte blow-up
    # (~3.2 GB/step written+read at B=256 x 2 views, ~4 ms at HBM speed) —
    # several times the whole block-2 non-GEMM budget (PERF.md r3).
    pool_reorder: bool = False
    # Eval-mode reorder (running stats, no full-size epilogue at all):
    # measured SLOWER on the HEAR conv timestamp surface (9.6 vs 11.6
    # clips/s, 2026-08-17) — like the eval fused kernel, XLA's forward-only
    # composition is already lean and the sign multiplies + separate pool
    # break its fusion.  Opt-in only.
    pool_reorder_eval: bool = False
    # Data-parallel mesh for the fused kernel (a jax.sharding.Mesh, hashable
    # so it can live on the module): when set, the training fused block runs
    # per-shard inside shard_map with the BN moments and parameter-gradient
    # partials psum'd over 'data' — global-batch statistics and replicated
    # grads, the reference's DDP + SyncBatchNorm semantics
    # (utils/utils.py:410-417).  None = single-device kernel.
    fused_mesh: object = None

    def _reordered_block(self, h: jnp.ndarray, i: int,
                         train: bool) -> jnp.ndarray:
        """Conv block with the pool moved BEFORE the BN affine + ReLU (same
        math as the unfused composition below; see the pool_reorder attribute
        docstring).  Training mode reduces batch stats over the full conv
        output (fp32, biased variance — flax _compute_stats semantics) and
        folds them into the running averages; eval mode uses the running
        stats directly and touches nothing full-size past the pool.  The
        epilogue mirrors ops/fused_conv._fwd_impl exactly (flax-parity-tested
        there)."""
        kernel, cbias = _ConvParams(self.base_d, h.shape[-1],
                                    name=f"Conv_{i}")()
        scale, bbias, ra_mean, ra_var = _BNParams(self.base_d,
                                                  name=f"BatchNorm_{i}")()
        y = jax.lax.conv_general_dilated(
            h, kernel.astype(h.dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cbias.astype(h.dtype)
        if train:
            y32 = y.astype(jnp.float32)
            mean = jnp.mean(y32, axis=(0, 1, 2))
            var = jnp.mean(y32 * y32, axis=(0, 1, 2)) - mean * mean
            if self.is_mutable_collection("batch_stats"):
                m = 0.9
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        # per-window extreme of y: max where gamma > 0, min otherwise.
        # gamma == 0 edge (ADVICE r3): z is window-constant there, so the
        # FORWARD is identical whichever element is picked, but the gradient
        # routes through the min-of-y element here vs flax's first-element-
        # of-window select-and-scatter tie-break — dgamma/dbeta can differ
        # on the measure-zero event of a BN scale landing exactly on 0.0
        # (never observed in training; scales init at 1 and move by float
        # increments).  Accepted, matching ops/fused_conv.py's convention.
        s = jnp.where(scale > 0, 1.0, -1.0).astype(y.dtype)
        ps = s * jax.lax.reduce_window(
            y * s, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        # BN affine + ReLU on the pooled extremes only
        r = jax.lax.rsqrt(var + 1e-5)
        g32 = scale.astype(jnp.float32)
        z = g32 * (ps.astype(jnp.float32) - mean) * r \
            + bbias.astype(jnp.float32)
        return jnp.maximum(z, 0.0).astype(h.dtype)

    def _fused_block(self, h: jnp.ndarray, i: int, train: bool) -> jnp.ndarray:
        """Same math as the unfused block below: fused kernel in training
        mode (batch stats + running-average update), forward-only kernel
        with running stats in eval mode."""
        from ssl_audio_tpu.ops.fused_conv import (
            fused_conv1_bn_relu_pool,
            fused_conv1_bn_relu_pool_eval,
            fused_conv1_bn_relu_pool_sharded,
        )

        kernel, cbias = _ConvParams(self.base_d, h.shape[-1],
                                    name=f"Conv_{i}")()
        scale, bbias, ra_mean, ra_var = _BNParams(self.base_d,
                                                  name=f"BatchNorm_{i}")()
        if train:
            if self.fused_mesh is not None:
                pooled, mean, var = fused_conv1_bn_relu_pool_sharded(
                    h, kernel, cbias, scale, bbias, mesh=self.fused_mesh)
            else:
                pooled, mean, var = fused_conv1_bn_relu_pool(
                    h, kernel, cbias, scale, bbias)
            if self.is_mutable_collection("batch_stats"):
                m = 0.9
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
            return pooled
        return fused_conv1_bn_relu_pool_eval(
            h, kernel, cbias, scale, bbias, ra_mean.value, ra_var.value)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, 1, F, T) -> frame embeddings (B, T', d)."""
        h = jnp.transpose(x, (0, 2, 3, 1))                    # NHWC (B, F, T, 1)
        for i in range(self.conv_layers):
            use_fused = self.fused_conv if train else self.fused_conv_eval
            if use_fused and h.shape[-1] == 1 \
                    and h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0:
                h = self._fused_block(h, i, train)
                if self.squeeze_excitation:
                    h = SEBlock()(h)
                continue
            # (odd H/W are fine here: VALID 2x2 pooling drops the tail
            # row/column identically in both compositions, and stats still
            # reduce over the full conv output)
            if (self.pool_reorder if train else self.pool_reorder_eval):
                h = self._reordered_block(h, i, train)
                if self.squeeze_excitation:
                    h = SEBlock()(h)
                continue
            h = nn.Conv(self.base_d, (3, 3), strides=1, padding=1,
                        name=f"Conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"BatchNorm_{i}")(h)
            h = nn.relu(h)
            # NOTE: a reshape+axis-max pool (to dodge the 2.9 ms
            # select-and-scatter backward, PERF.md trace) was tried and
            # measured SLOWER overall (26.2 -> 32.0 ms/step at B=256): the
            # eq-mask backward + broken producer fusion cost more than
            # select-and-scatter.  nn.max_pool stays.
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            if self.squeeze_excitation:
                h = SEBlock()(h)
        # (B, F', T', C) -> (B, T', F'*C): time-major frames, mel x channel
        # features; matches reference permute(0,3,2,1).reshape (model.py:167-169)
        B, Fp, Tp, C = h.shape
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(B, Tp, Fp * C)
        conv_d = self.base_d * (self.n_mels // (2 ** self.conv_layers))
        assert h.shape[-1] == conv_d
        y = nn.Dense(self.mlp_hidden_d)(h)
        y = nn.relu(y)
        y = nn.Dropout(0.3, deterministic=not train)(y)
        y = nn.Dense(self.d - conv_d)(y)
        y = nn.relu(y)
        if self.stack:
            return jnp.concatenate([h, y], axis=-1)           # (B, T', d)
        return y


class AudioNTT2022(nn.Module):
    """Pooled encoder: (B, 1, F, T) -> (B, d)."""

    n_mels: int = 64
    d: int = 3072
    mlp_hidden_d: int = 2048
    squeeze_excitation: bool = False
    fused_conv: bool = False
    fused_conv_eval: bool = False
    pool_reorder: bool = False
    pool_reorder_eval: bool = False
    fused_mesh: object = None

    @property
    def embed_dim(self) -> int:
        return self.d

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        frames = AudioNTT2022Encoder(
            n_mels=self.n_mels,
            d=self.d,
            mlp_hidden_d=self.mlp_hidden_d,
            squeeze_excitation=self.squeeze_excitation,
            fused_conv=self.fused_conv,
            fused_conv_eval=self.fused_conv_eval,
            pool_reorder=self.pool_reorder,
            pool_reorder_eval=self.pool_reorder_eval,
            fused_mesh=self.fused_mesh,
            name="encoder",
        )(x, train=train)
        return mean_max_pooling(frames)
