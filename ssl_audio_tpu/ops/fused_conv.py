"""Fused Conv3x3(Cin=1) + BatchNorm + ReLU + MaxPool2x2 Pallas block for the
AudioNTT first conv layer (reference model.py:130-172 block 1).

Why: the XProf trace of the AudioNTT B=256 train step (PERF.md r3) shows
block 1 costs ~14.4 of 26.2 ms fp32 — almost all of it HBM traffic on the
(B, 64, 96, 64) conv activation (402 MB fp32) that XLA materializes five+
times across BN/ReLU/pool forward, residuals, select-and-scatter and BN
backward.  This kernel never materializes it:

* forward: ONE pass computes y = conv(x) per (image, H-strip) tile (MXU,
  K=9 im2col), accumulates per-channel (sum_y, sum_y2) for the BN batch
  stats, and writes only the 2x2-window max of y (min where gamma < 0).
  Because z = gamma*(y-mu)*rsqrt(var+eps)+beta and relu are monotone in y
  (direction = sign(gamma)), pool(relu(z)) == relu(affine(window-extreme
  of y)) — the normalize+relu "epilogue" runs outside on the 4x-smaller
  pooled tensor.
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

Tiles are H-strips of one image (grid (B*H/HS,), strip height HS rows of
the mel axis, even so 2x2 windows never straddle a strip) to stay well
inside the ~16 MB VMEM scoped-stack budget — the first full-image version
of this kernel OOMed Mosaic's stack at 37 MB.

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

# tap order matches XLA's row-major window iteration (dh-major), which is
# also select-and-scatter's tie-break order
TAPS = [(dh, dw) for dh in range(3) for dw in range(3)]

HS = 32          # strip height (rows of H per grid step); must be even


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _build_x9(x2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x2 (B, H, W) -> X9 (B, H*W, 9) and X9T (B, 9, H*W): the nine
    zero-padded tap shifts, in the two layouts the MXU wants (shallow-K for
    the conv (re)compute, deep-K for the gradient reductions)."""
    B, H, W = x2.shape
    xp = jnp.pad(x2, ((0, 0), (1, 1), (1, 1)))
    cols = [xp[:, dh:dh + H, dw:dw + W].reshape(B, H * W) for dh, dw in TAPS]
    x9t = jnp.stack(cols, axis=1)                     # (B, 9, M)
    return jnp.transpose(x9t, (0, 2, 1)), x9t         # (B, M, 9), (B, 9, M)


def _strip_y(x9_ref, wk_ref, b_ref):
    """Conv for one strip: (M_s, 9) @ (9, C) + b -> (M_s, C) fp32."""
    x9 = x9_ref[0].astype(jnp.float32)
    wk = wk_ref[:].astype(jnp.float32)
    y = jnp.dot(x9, wk, preferred_element_type=jnp.float32)
    return y + b_ref[:].astype(jnp.float32)


def _pool_pair(a, W, C, op):
    """(HS/2, W, C) -> (HS/2, W/2, C): adjacent-W reduce via a sublane-pair
    split (the W axis sits on sublanes; (W/2, 2) keeps pairs adjacent)."""
    return op(a.reshape(a.shape[0], W // 2, 2, C), axis=2)


def _windows(y, W, C, hs):
    """y (M_s, C) -> the four 2x2-window corner views (hs/2, W/2, C), in
    select-and-scatter tie-break order (0,0), (0,1), (1,0), (1,1).

    5-D reshape + integer indexing: strided slices (y3[0::2]) lower to an
    unsupported >2-D gather in Mosaic; this form lowers to plain slices."""
    y5 = y.reshape(hs // 2, 2, W // 2, 2, C)
    return (y5[:, 0, :, 0], y5[:, 0, :, 1], y5[:, 1, :, 0], y5[:, 1, :, 1])


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x9_ref, wk_ref, b_ref, g_ref, sel_ref, sums_ref, *, W, C):
    y = _strip_y(x9_ref, wk_ref, b_ref)               # (M_s, C)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    sums_ref[0, :] += jnp.sum(y, axis=0)
    sums_ref[1, :] += jnp.sum(y * y, axis=0)

    v00, v01, v10, v11 = _windows(y, W, C, HS)
    wmax = jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11))
    wmin = jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11))
    sel = jnp.where(g_ref[:] > 0, wmax, wmin)
    sel_ref[0] = sel.astype(sel_ref.dtype)


def _fwd_call(x9, wk, b, gamma, H, W, C):
    B = x9.shape[0]
    n_strips = H // HS
    ms = HS * W
    x9s = x9.reshape(B * n_strips, ms, 9)
    kern = functools.partial(_fwd_kernel, W=W, C=C)
    sel, sums = pl.pallas_call(
        kern,
        grid=(B * n_strips,),
        in_specs=[
            pl.BlockSpec((1, ms, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, HS // 2, W // 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * n_strips, HS // 2, W // 2, C), x9.dtype),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ],
        interpret=_interpret(),
    )(x9s, wk, b.reshape(1, C), gamma.reshape(1, C).astype(jnp.float32))
    return sel.reshape(B, H // 2, W // 2, C), sums


# ---------------------------------------------------------------------------
# backward: shared dz recomputation + reduction / dx kernels
# ---------------------------------------------------------------------------

def _strip_dz(x9_ref, wk_ref, b_ref, g_ref, be_ref, st_ref, dp_ref, W, C):
    """Recompute the strip's y, xhat, and dz = unpool(dp) * relu'(z);
    returns (y, xhat, dz) each (M_s, C) fp32."""
    y = _strip_y(x9_ref, wk_ref, b_ref)
    mu = st_ref[0, :]
    r = st_ref[1, :]                                   # rsqrt(var + eps)
    g = g_ref[:].astype(jnp.float32)                   # (1, C)
    be = be_ref[:].astype(jnp.float32)
    xhat = (y - mu) * r
    z = g * xhat + be

    v00, v01, v10, v11 = _windows(y, W, C, HS)
    pos = g > 0
    ext = jnp.where(
        pos, jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11)),
        jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11)))
    e00 = v00 == ext
    e01 = (v01 == ext) & ~e00
    e10 = (v10 == ext) & ~(e00 | e01)
    e11 = (v11 == ext) & ~(e00 | e01 | e10)
    dp = dp_ref[0].astype(jnp.float32)                 # (HS/2, W/2, C)
    # interleave back to full resolution (inverse of _windows' 5-D split)
    da = jnp.stack(
        [jnp.stack([dp * e00, dp * e01], axis=2),
         jnp.stack([dp * e10, dp * e11], axis=2)], axis=1,
    ).reshape(HS * W, C)                               # (h2, 2, W/2, 2, C)
    dz = da * (z > 0)
    return y, xhat, dz


def _bwd_kernel(x9_ref, x9t_ref, wk_ref, b_ref, g_ref, be_ref, st_ref, dp_ref,
                acc_ref, *, W, C):
    """Accumulates rows [T1; T2; Sx; A2(9); A1(9); A3(9)] -> (30, C)."""
    _y, xhat, dz = _strip_dz(x9_ref, wk_ref, b_ref, g_ref, be_ref, st_ref,
                             dp_ref, W, C)
    x9t = x9t_ref[0].astype(jnp.float32)               # (9, M_s)
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
    n_strips = H // HS
    ms = HS * W
    x9s = x9.reshape(B * n_strips, ms, 9)
    x9ts = (x9t.reshape(B, 9, n_strips, ms)
            .transpose(0, 2, 1, 3).reshape(B * n_strips, 9, ms))
    dps = dp.reshape(B * n_strips, HS // 2, W // 2, C)
    stats = jnp.stack([mu, r]).astype(jnp.float32)     # (2, C)
    kern = functools.partial(_bwd_kernel, W=W, C=C)
    acc = pl.pallas_call(
        kern,
        grid=(B * n_strips,),
        in_specs=[
            pl.BlockSpec((1, ms, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 9, ms), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((2, C), lambda i: (0, 0)),
            pl.BlockSpec((1, HS // 2, W // 2, C), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((30, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((30, C), jnp.float32),
        interpret=_interpret(),
    )(x9s, x9ts, wk, b.reshape(1, C), gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), stats, dps)
    return acc


def _dx_kernel(x9_ref, wk_ref, b_ref, g_ref, be_ref, st_ref, dp_ref, s_ref,
               dx_ref, *, W, C):
    """dx for one strip: dy = r*g*(dz - T1/N - xhat*T2/N), then
    dx[q] = sum_s dy[q - off_s]*W[s] via the transposed-conv taps.  The
    strip's dx needs dy rows from the strips above/below at the seams; this
    kernel instead writes the three tap-row partial sums separately and the
    caller combines shifted copies outside (tiny XLA elementwise)."""
    _y, xhat, dz = _strip_dz(x9_ref, wk_ref, b_ref, g_ref, be_ref, st_ref,
                             dp_ref, W, C)
    t1 = s_ref[0, :]
    t2 = s_ref[1, :]
    n = s_ref[2, 0]
    g = g_ref[:].astype(jnp.float32)
    r = st_ref[1, :]
    dy = (r * g) * (dz - t1 / n - xhat * (t2 / n))     # (M_s, C)
    dy3 = dy.reshape(HS, W, C)
    wk = wk_ref[:].astype(jnp.float32)                 # (9, C)
    # per tap-row dh: row_dh[h, w] = sum_c sum_dw dy[h, w + dw - 1] * W[dh, dw]
    dyp = jnp.pad(dy3, ((0, 0), (1, 1), (0, 0)))
    for dh in range(3):
        row = jnp.zeros((HS, W), jnp.float32)
        for dw in range(3):
            s = dh * 3 + dw
            sl = dyp[:, 2 - dw:2 - dw + W]             # (HS, W, C)
            row = row + jnp.sum(sl * wk[s], axis=-1)
        dx_ref[0, dh] = row.astype(dx_ref.dtype)


def _dx_call(x9, wk, b, gamma, beta, mu, r, t1, t2, n, dp, H, W, C):
    """Returns dx (B, H, W): combines the per-tap-row strip outputs with
    the +-1 H shifts the 3x3 transposed conv needs across strip seams."""
    B = x9.shape[0]
    n_strips = H // HS
    ms = HS * W
    x9s = x9.reshape(B * n_strips, ms, 9)
    dps = dp.reshape(B * n_strips, HS // 2, W // 2, C)
    stats = jnp.stack([mu, r]).astype(jnp.float32)
    sums = jnp.stack([t1, t2, jnp.full_like(t1, n)]).astype(jnp.float32)
    kern = functools.partial(_dx_kernel, W=W, C=C)
    rows = pl.pallas_call(
        kern,
        grid=(B * n_strips,),
        in_specs=[
            pl.BlockSpec((1, ms, 9), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((2, C), lambda i: (0, 0)),
            pl.BlockSpec((1, HS // 2, W // 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, HS, W), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * n_strips, 3, HS, W), x9.dtype),
        interpret=_interpret(),
    )(x9s, wk, b.reshape(1, C), gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), stats, dps, sums)
    rows = (rows.reshape(B, n_strips, 3, HS, W)
            .transpose(0, 2, 1, 3, 4).reshape(B, 3, H, W).astype(jnp.float32))
    # dx[h] = row0[h+1] + row1[h] + row2[h-1]  (tap dh contributes at h-dh+1)
    rp = jnp.pad(rows, ((0, 0), (0, 0), (1, 1), (0, 0)))
    dx = rp[:, 0, 2:] + rp[:, 1, 1:-1] + rp[:, 2, :-2]
    return dx


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_conv1_bn_relu_pool(x, kernel, bias, gamma, beta, eps=1e-5):
    """x (B, H, W, 1) -> (pooled (B, H/2, W/2, C), mean (C,), var (C,)).

    Training-mode batch statistics; the caller folds mean/var into the
    running averages.  kernel (3, 3, 1, C); H must be a multiple of the
    strip height (16), W even."""
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
