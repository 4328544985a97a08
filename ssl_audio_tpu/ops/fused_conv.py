"""Fused Conv3x3(Cin=1) + BatchNorm + ReLU + MaxPool2x2 Pallas block for the
AudioNTT first conv layer (reference model.py:130-172 block 1).

Why: the XProf trace of the AudioNTT B=256 train step (PERF.md r3) shows
block 1 costs ~14.4 of 26.2 ms fp32 — almost all of it HBM traffic on the
(B, 64, 96, 64) conv activation (402 MB fp32) that XLA materializes five+
times across BN/ReLU/pool forward, residuals, select-and-scatter and BN
backward.  This kernel never materializes it:

* forward: ONE pass computes y = conv(x) per batch tile (MXU, K=9 im2col),
  accumulates per-channel (sum_y, sum_y2) for the BN batch stats, and writes
  only the 2x2-window max of y (min where gamma < 0).  Because
  z = gamma*(y-mu)*rsqrt(var+eps)+beta and relu are monotone in y (direction
  = sign(gamma)), pool(relu(z)) == relu(affine(window-extreme of y)) — the
  normalize+relu "epilogue" runs outside on the 4x-smaller pooled tensor.
* backward: ONE pass per tile recomputes y, forms dz = unpool(dp)*relu',
  and reduces everything the parameter gradients need:
    T1[c]    = sum dz            T2[c] = sum dz*xhat     Sx[c] = sum xhat
    A1[s, c] = sum x_s*dz        A3[s, c] = sum x_s*xhat A2[s] = sum x_s
  (x_s = input shifted by tap s) as deep-K MXU GEMMs.  The BN chain rule
  then assembles dW/db/dgamma/dbeta OUTSIDE the kernel from these sums:
    dW[s,c] = r*g*(A1 - A2*T1/N - A3*T2/N)     dgamma = T2, dbeta = T1
    db[c]   = -r*g*Sx*T2/N                      (Sx ~ 0 up to float error)
  dx (cotangent of the input) is a separate pallas_call so XLA dead-code-
  eliminates it when x is not on the grad path (block 1's input is data).

Numerics match flax nn.Conv(padding=1) + nn.BatchNorm(momentum 0.9,
eps 1e-5, biased variance) + relu + nn.max_pool((2,2),(2,2)) including the
select-and-scatter first-max tie-break (tests/test_fused_conv.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tap order matches XLA's row-major window iteration (dh-major), which is
# also select-and-scatter's tie-break order
TAPS = [(dh, dw) for dh in range(3) for dw in range(3)]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _build_x9(x2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x2 (B, H, W) -> X9 (B, H*W, 9) and X9T (B, 9, H*W): the nine
    zero-padded tap shifts, in the two layouts the MXU wants (shallow-K for
    the conv recompute, deep-K for the gradient reductions)."""
    B, H, W = x2.shape
    xp = jnp.pad(x2, ((0, 0), (1, 1), (1, 1)))
    cols = [xp[:, dh:dh + H, dw:dw + W].reshape(B, H * W) for dh, dw in TAPS]
    x9t = jnp.stack(cols, axis=1)                     # (B, 9, M)
    return jnp.transpose(x9t, (0, 2, 1)), x9t         # (B, M, 9), (B, 9, M)


def _window_views(y4: jnp.ndarray):
    """y4 (H, W, C) -> the four 2x2-window corner views (H/2, W/2, C), in
    select-and-scatter tie-break order (0,0), (0,1), (1,0), (1,1)."""
    H, W, C = y4.shape
    y6 = y4.reshape(H // 2, 2, W // 2, 2, C)
    return (y6[:, 0, :, 0], y6[:, 0, :, 1], y6[:, 1, :, 0], y6[:, 1, :, 1])


def _recompute_y(x9_ref, wk_ref, b_ref, H, W, C):
    x9 = x9_ref[0].astype(jnp.float32)                # (M, 9)
    wk = wk_ref[:].astype(jnp.float32)                # (9, C)
    y = jnp.dot(x9, wk, preferred_element_type=jnp.float32)
    return y + b_ref[:].astype(jnp.float32)           # (M, C)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x9_ref, wk_ref, b_ref, g_ref, sel_ref, sums_ref, *, H, W, C):
    y = _recompute_y(x9_ref, wk_ref, b_ref, H, W, C)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    sums_ref[0, :] += jnp.sum(y, axis=0)
    sums_ref[1, :] += jnp.sum(y * y, axis=0)

    v00, v01, v10, v11 = _window_views(y.reshape(H, W, C))
    wmax = jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11))
    wmin = jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11))
    sel = jnp.where(g_ref[:] > 0, wmax, wmin)
    sel_ref[0] = sel.astype(sel_ref.dtype)


def _fwd_call(x9, wk, b, gamma, H, W, C):
    B = x9.shape[0]
    kern = functools.partial(_fwd_kernel, H=H, W=W, C=C)
    sel, sums = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * W, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H // 2, W // 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H // 2, W // 2, C), x9.dtype),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(x9, wk, b.reshape(1, C), gamma.reshape(1, C).astype(jnp.float32))
    return sel, sums


# ---------------------------------------------------------------------------
# backward reductions
# ---------------------------------------------------------------------------

def _bwd_kernel(x9_ref, x9t_ref, wk_ref, b_ref, g_ref, be_ref, st_ref, dp_ref,
                acc_ref, *, H, W, C):
    """Accumulates rows [T1; T2; Sx; A2; A1(9); A3(9)] -> (21, C)."""
    y = _recompute_y(x9_ref, wk_ref, b_ref, H, W, C)

    mu = st_ref[0, :]
    r = st_ref[1, :]                                   # rsqrt(var + eps)
    g = g_ref[:].astype(jnp.float32)                   # (1, C)
    be = be_ref[:].astype(jnp.float32)
    xhat = (y - mu) * r                                # (M, C)
    z = g * xhat + be

    # unpool dp to the first-extreme position of each 2x2 window (extreme =
    # max when gamma > 0 else min), then relu' mask
    y4 = y.reshape(H, W, C)
    v00, v01, v10, v11 = _window_views(y4)
    pos = g > 0
    ext = jnp.where(pos, jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11)),
                    jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11)))
    e00 = v00 == ext
    e01 = (v01 == ext) & ~e00
    e10 = (v10 == ext) & ~(e00 | e01)
    e11 = (v11 == ext) & ~(e00 | e01 | e10)
    dp = dp_ref[0].astype(jnp.float32)                 # (H/2, W/2, C)
    H2, W2 = H // 2, W // 2
    da6 = jnp.stack(
        [jnp.stack([dp * e00, dp * e01], axis=2),
         jnp.stack([dp * e10, dp * e11], axis=2)], axis=1,
    )                                                  # (H/2, 2, W/2, 2, C)
    da = da6.reshape(H, W, C)
    dz = (da * (z.reshape(H, W, C) > 0)).reshape(H * W, C)

    x9t = x9t_ref[0].astype(jnp.float32)               # (9, M)
    a1 = jnp.dot(x9t, dz, preferred_element_type=jnp.float32)    # (9, C)
    a3 = jnp.dot(x9t, xhat, preferred_element_type=jnp.float32)  # (9, C)
    a2 = jnp.sum(x9t, axis=1, keepdims=True)           # (9, 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[0, :] += jnp.sum(dz, axis=0)               # T1
    acc_ref[1, :] += jnp.sum(dz * xhat, axis=0)        # T2
    acc_ref[2, :] += jnp.sum(xhat, axis=0)             # Sx
    acc_ref[3:12, :] += a2 * jnp.ones((1, C), jnp.float32)   # A2 (bcast)
    acc_ref[12:21, :] += a1                            # A1
    acc_ref[21:30, :] += a3                            # A3


def _bwd_call(x9, x9t, wk, b, gamma, beta, mu, r, dp, H, W, C):
    B = x9.shape[0]
    stats = jnp.stack([mu, r]).astype(jnp.float32)     # (2, C)
    kern = functools.partial(_bwd_kernel, H=H, W=W, C=C)
    acc = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * W, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 9, H * W), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((2, C), lambda i: (0, 0)),
            pl.BlockSpec((1, H // 2, W // 2, C), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((30, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((30, C), jnp.float32),
        interpret=_interpret(),
    )(x9, x9t, wk, b.reshape(1, C), gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), stats, dp)
    return acc


def _dx_kernel(x9_ref, wk_ref, b_ref, g_ref, be_ref, st_ref, dp_ref, s_ref,
               dx_ref, *, H, W, C):
    """dx for completeness (one tile): recompute dz, form
    dy = r*g*(dz - T1/N - xhat*T2/N), then dx[q] = sum_s dy[q - off_s]*W[s].
    Only traced when the caller actually uses the input cotangent."""
    y = _recompute_y(x9_ref, wk_ref, b_ref, H, W, C)
    mu, r = st_ref[0, :], st_ref[1, :]
    g = g_ref[:].astype(jnp.float32)
    be = be_ref[:].astype(jnp.float32)
    xhat = (y - mu) * r
    z = g * xhat + be
    y4 = y.reshape(H, W, C)
    v00, v01, v10, v11 = _window_views(y4)
    pos = g > 0
    ext = jnp.where(pos, jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11)),
                    jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11)))
    e00 = v00 == ext
    e01 = (v01 == ext) & ~e00
    e10 = (v10 == ext) & ~(e00 | e01)
    e11 = (v11 == ext) & ~(e00 | e01 | e10)
    dp = dp_ref[0].astype(jnp.float32)
    da6 = jnp.stack(
        [jnp.stack([dp * e00, dp * e01], axis=2),
         jnp.stack([dp * e10, dp * e11], axis=2)], axis=1,
    )
    da = da6.reshape(H, W, C)
    dz = da * (z.reshape(H, W, C) > 0)
    t1 = s_ref[0, :]
    t2 = s_ref[1, :]
    n = s_ref[2, 0]
    dy = (r * g) * (dz - t1 / n - xhat.reshape(H, W, C) * (t2 / n))
    # dx[h, w] = sum_s dy[h - (dh-1), w - (dw-1)] * W[s] summed over channels
    dyp = jnp.pad(dy, ((1, 1), (1, 1), (0, 0)))
    wk = wk_ref[:].astype(jnp.float32)                 # (9, C)
    dx = jnp.zeros((H, W), jnp.float32)
    for s, (dh, dw) in enumerate(TAPS):
        # shifted dy windows: contribution of tap s lands at q = p - off_s
        sl = dyp[2 - dh:2 - dh + H, 2 - dw:2 - dw + W]  # (H, W, C)
        dx = dx + jnp.sum(sl * wk[s], axis=-1)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _dx_call(x9, wk, b, gamma, beta, mu, r, t1, t2, n, dp, H, W, C):
    B = x9.shape[0]
    stats = jnp.stack([mu, r]).astype(jnp.float32)
    sums = jnp.stack([t1, t2, jnp.full_like(t1, n)]).astype(jnp.float32)
    kern = functools.partial(_dx_kernel, H=H, W=W, C=C)
    dx = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * W, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((2, C), lambda i: (0, 0)),
            pl.BlockSpec((1, H // 2, W // 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), x9.dtype),
        interpret=_interpret(),
    )(x9, wk, b.reshape(1, C), gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), stats, dp, sums)
    return dx


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_conv1_bn_relu_pool(x, kernel, bias, gamma, beta, eps=1e-5):
    """x (B, H, W, 1) -> (pooled (B, H/2, W/2, C), mean (C,), var (C,)).

    Training-mode batch statistics; the caller folds mean/var into the
    running averages.  kernel (3, 3, 1, C); H and W must be even."""
    out, _ = _fwd_impl(x, kernel, bias, gamma, beta, eps)
    return out


def _fwd_impl(x, kernel, bias, gamma, beta, eps):
    B, H, W, _ = x.shape
    C = kernel.shape[-1]
    x9, x9t = _build_x9(x[..., 0])
    wk = kernel.reshape(9, C)
    sel, sums = _fwd_call(x9, wk, bias, gamma, H, W, C)
    n = B * H * W
    mean = sums[0] / n
    var = sums[1] / n - mean * mean
    r = jax.lax.rsqrt(var + eps)
    g32 = gamma.astype(jnp.float32)
    z_sel = (g32 * (sel.astype(jnp.float32) - mean) * r
             + beta.astype(jnp.float32))
    pooled = jnp.maximum(z_sel, 0.0).astype(x.dtype)
    res = (x9, x9t, wk, bias, gamma, beta, mean, r)
    return (pooled, mean, var), res


def _fwd_rule(x, kernel, bias, gamma, beta, eps):
    return _fwd_impl(x, kernel, bias, gamma, beta, eps)


def _bwd_rule(eps, res, cotangents):
    dpooled, _dmean, _dvar = cotangents       # mean/var feed non-diff buffers
    x9, x9t, wk, bias, gamma, beta, mean, r = res
    B = x9.shape[0]
    xdt = x9.dtype
    H2, W2, C = dpooled.shape[1:]
    H, W = 2 * H2, 2 * W2
    n = B * H * W
    acc = _bwd_call(x9, x9t, wk, bias, gamma, beta, mean, r, dpooled, H, W, C)
    t1, t2, sx = acc[0], acc[1], acc[2]
    a2 = acc[3:12]
    a1 = acc[12:21]
    a3 = acc[21:30]
    g32 = gamma.astype(jnp.float32)
    rg = r * g32
    dW = rg[None, :] * (a1 - a2 * (t1[None, :] / n) - a3 * (t2[None, :] / n))
    db = -(rg * sx * t2) / n
    dgamma = t2
    dbeta = t1
    dx2 = _dx_call(x9, wk, bias, gamma, beta, mean, r, t1, t2, n, dpooled,
                   H, W, C)
    dx = dx2[..., None].astype(xdt)
    return (dx, dW.reshape(3, 3, 1, C).astype(xdt), db.astype(xdt),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


fused_conv1_bn_relu_pool.defvjp(_fwd_rule, _bwd_rule)
