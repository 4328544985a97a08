"""Fused Conv3x3(Cin=1) + BatchNorm + ReLU + MaxPool2x2 Pallas block for the
AudioNTT first conv layer (reference model.py:130-172 block 1).

Why: the XProf trace of the AudioNTT B=256 train step (PERF.md r3) shows
block 1 costs ~14.4 of 26.2 ms fp32 — almost all of it HBM traffic on the
(B, 64, 96, 64) conv activation (402 MB fp32) that XLA materializes five+
times across BN/ReLU/pool forward, residuals, select-and-scatter and BN
backward.  This kernel never materializes it — in fact the full-resolution
activation never exists even in VMEM:

Everything is computed at 2x2-WINDOW granularity in a channels-on-sublanes
layout.  For window corner p = (pi, pj) and conv tap s = (dh, dw), the
input value tap s sees at window (i, j) is xpad[2i+pi+dh, 2j+pj+dw] =
parity-plane (qh, qw) at offset (oh, ow), where pi+dh = 2*oh + qh.  The 36
(p, s) pairs hit only **16 unique (plane, offset) combinations**, so the
host builds X16 (B, 16, Mq) — 16 shifted full-window views with
Mq = H/2*W/2 window cells on lanes (4 strided parity slices, then all-
contiguous views; materializing all 36 rows was measured 2.2x more build
time and 2.2x the kernel load bytes).  Each window-corner of the conv
output is then ONE dense MXU matmul

    v_p = W16[p] (C, 16) @ X16 (16, Mq)      W16[p][c, u] = wk[c, s]
                                             scattered via u(p, s)

with zero columns for the 7 slots corner p never touches (exact: 0*x
contributes nothing).  No minor-dim-9 arrays, no 5-D reshapes, no
interleaves.  (Two earlier designs failed: full-image tiles OOMed Mosaic's
~16 MB VMEM scoped stack at 37 MB, and (M, 9)-layout strips spent
5-9 us/strip on padded lane-tiles and relayouts.)

* forward: accumulates per-channel (sum_y, sum_y2) for the BN batch stats
  and writes only the window extreme of y (max, or min where gamma < 0).
  Because z = gamma*(y-mu)*rsqrt(var+eps)+beta and relu are monotone in y
  (direction = sign(gamma)), pool(relu(z)) == relu(affine(extreme)) — the
  normalize+relu epilogue runs outside on the 4x-smaller pooled tensor.
* backward: recomputes the four corners, forms dzw_p = dp*e_p*relu'(z_p)
  (e_p = first-extreme tie-break mask, select-and-scatter order), and
  reduces everything the parameter gradients need:
    T1[c]    = sum dz           T2[c]    = sum dz*xhat    Sx[c] = sum xhat
    G1[p,c,u]= dz_p @ X16^T     G3[p,c,u]= xhat_p @ X16^T R[u]  = sum X16
  as deep-K MXU contractions over the window axis.  The per-tap sums the
  BN chain rule needs are static gathers of the 16-column outputs:
    A1[c,s] = sum_p G1[p,c,u(p,s)]   A3 likewise   A2[s] = sum_p R[u(p,s)]
  and dW/db/dgamma/dbeta assemble OUTSIDE the kernel:
    dW[s,c] = r*g*(A1 - A2*T1/N - A3*T2/N)     dgamma = T2, dbeta = T1
    db[c]   = -r*g*Sx*T2/N                      (Sx ~ 0 up to float error)
  dx (cotangent of the input) is a separate pallas_call so XLA dead-code-
  eliminates it when x is not on the grad path (block 1's input is data).

bf16 inputs stay bf16 into the MXU (single-pass, f32 accumulate — exact
for bf16 operands); f32 inputs use the multi-pass f32 dot.

Numerics match flax nn.Conv(padding=1) + nn.BatchNorm(momentum 0.9,
eps 1e-5, biased variance) + relu + nn.max_pool((2,2),(2,2)) including the
select-and-scatter first-max tie-break (tests/test_fused_conv.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# tap order matches XLA's row-major window iteration (dh-major), which is
# also select-and-scatter's tie-break order
TAPS = [(dh, dw) for dh in range(3) for dw in range(3)]
# window-corner order = select-and-scatter tie-break order
CORNERS = [(0, 0), (0, 1), (1, 0), (1, 1)]

NB = 1           # images per grid step


def _slot(qh: int, qw: int, oh: int, ow: int) -> int:
    return ((qh * 2 + qw) * 2 + oh) * 2 + ow


def _u_of(p: int, s: int) -> int:
    """Unique (parity-plane, offset) slot for corner p, tap s."""
    pi, pj = CORNERS[p]
    dh, dw = TAPS[s]
    return _slot((pi + dh) % 2, (pj + dw) % 2, (pi + dh) // 2, (pj + dw) // 2)


# U_MAP[p][s] = slot index; for fixed p the 9 slots are distinct
U_MAP = np.array([[_u_of(p, s) for s in range(9)] for p in range(4)])


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _build_x16(x2: jnp.ndarray) -> jnp.ndarray:
    """x2 (B, H, W) -> X16 (B, 16, Mq) in the FLAT-SHIFT layout,
    Mq = (H/2) * (W/2 + 1):

        X16[b, slot(qh, qw, oh, ow), i*(w2+1)+j] = xpad[b, 2(i+oh)+qh,
                                                          2(j+ow)+qw]

    Window cells are indexed m = i*(w2+1)+j over the UNCROPPED parity-plane
    width, so a shift by (oh, ow) is the pure 1-D lane offset oh*(w2+1)+ow
    of the flattened plane — every view is one contiguous lane slice.  The
    price is one invalid lane per window row (j = w2, which would read the
    neighbouring row's first cell); those lanes are ZEROED here, fused into
    the (bandwidth-bound) build pass, so the kernels stay mask-free: every
    reduction over x16 is automatically exact, the conv corners evaluate to
    exactly v = bias there (zero window dot + bias), and the only sums v
    enters directly (s1/s2 forward, Sx backward) get that closed-form
    garbage contribution subtracted by the callers.  Callers slice the
    invalid output column off the (4x smaller) pooled/dy tensors.

    The earlier layout cropped each view to (h2, w2) before flattening —
    valid-only lanes, but the 16 odd-dim 2-D slices lowered at ~15 GB/s
    (0.87 ms of the 14.2 ms AudioNTT step, XProf 2026-08-19); the flat
    shifts are plain lane-contiguous copies (0.26 -> 0.01 ms isolated,
    tools/bench_fused.py 2026-08-19)."""
    B, H, W = x2.shape
    h2, w2 = H // 2, W // 2
    w2p = w2 + 1
    mq = h2 * w2p
    xp = jnp.pad(x2, ((0, 0), (1, 1), (1, 1)))        # (B, 2(h2+1), 2*w2p)
    # parity de-interleave as ONE transpose: (B, qh*2+qw, (h2+1)*w2p) flat
    fl = (xp.reshape(B, h2 + 1, 2, w2p, 2)
          .transpose(0, 2, 4, 1, 3)
          .reshape(B, 4, (h2 + 1) * w2p))
    # headroom so off + mq stays in bounds (max off = w2p + 1)
    fl = jnp.pad(fl, ((0, 0), (0, 0), (0, w2p + 2)))
    rows = [None] * 16
    for qh in range(2):
        for qw in range(2):
            p_idx = qh * 2 + qw
            for oh in range(2):
                for ow in range(2):
                    off = oh * w2p + ow
                    rows[_slot(qh, qw, oh, ow)] = jax.lax.slice(
                        fl, (0, p_idx, off), (B, p_idx + 1, off + mq))
    x16 = jnp.concatenate(rows, axis=1)               # (B, 16, Mq)
    return x16 * jnp.asarray(_valid_mask(h2, w2), x16.dtype)


def _valid_mask(h2: int, w2: int) -> np.ndarray:
    """(1, Mq) 1.0/0.0 mask of the valid window cells in the flat-shift
    layout (lane j = w2 of each window row is garbage)."""
    w2p = w2 + 1
    return (np.arange(h2 * w2p).reshape(1, -1) % w2p < w2).astype(np.float32)


def _fold_w16(wkt: jnp.ndarray) -> jnp.ndarray:
    """wkt (C, 9) -> W16 (4, C, 16): per-corner weight matrix with wk[c, s]
    scattered into column u(p, s) (zeros elsewhere — exact)."""
    C = wkt.shape[0]
    w16 = jnp.zeros((4, C, 16), wkt.dtype)
    for p in range(4):
        w16 = w16.at[p, :, U_MAP[p]].set(wkt.T)       # (9, C) rows -> slots
    return w16


def _corner(x16_ref, w16_ref, b_ref, p: int):
    """Window-corner p of the conv output, channels on sublanes:
    (C, 16) @ (16, Mq) + b -> (C, Mq) fp32."""
    x16 = x16_ref[0]                                  # (16, Mq)
    w = w16_ref[p]                                    # (C, 16)
    if x16.dtype == jnp.bfloat16:
        w = w.astype(jnp.bfloat16)
    else:
        x16 = x16.astype(jnp.float32)
        w = w.astype(jnp.float32)
    v = jnp.dot(w, x16, preferred_element_type=jnp.float32)
    return v + b_ref[:].astype(jnp.float32)           # b (C, 1)


def _extreme(vs, pos):
    """Per-channel max (where pos) / min over the four corners."""
    mx = jnp.maximum(jnp.maximum(vs[0], vs[1]), jnp.maximum(vs[2], vs[3]))
    mn = jnp.minimum(jnp.minimum(vs[0], vs[1]), jnp.minimum(vs[2], vs[3]))
    return jnp.where(pos, mx, mn)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x16_ref, w16_ref, b_ref, g_ref, sel_ref, s1_ref, s2_ref):
    """Mask-free: x16's invalid lanes are zeroed at build time, so each
    corner evaluates to exactly v = bias there; the caller subtracts that
    closed-form garbage contribution from s1/s2 (see _fwd_impl)."""
    vs = [_corner(x16_ref, w16_ref, b_ref, p) for p in range(4)]

    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += sum(jnp.sum(v, axis=1, keepdims=True) for v in vs)
    s2_ref[:] += sum(jnp.sum(v * v, axis=1, keepdims=True) for v in vs)

    sel = _extreme(vs, g_ref[:] > 0)                  # (C, Mq)
    sel_ref[0] = sel.astype(sel_ref.dtype)


def _fwd_call(x16, w16, b, gamma, C, Mq):
    B = x16.shape[0]
    sel, s1, s2 = pl.pallas_call(
        _fwd_kernel,
        grid=(B // NB,),
        in_specs=[
            pl.BlockSpec((NB, 16, Mq), lambda i: (i, 0, 0)),
            pl.BlockSpec((4, C, 16), lambda i: (0, 0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, C, Mq), lambda i: (i, 0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, Mq), x16.dtype),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(x16, w16, b.reshape(C, 1), gamma.reshape(C, 1).astype(jnp.float32))
    return sel, s1[:, 0], s2[:, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _corners_dz(x16_ref, w16_ref, b_ref, g_ref, be_ref, st_ref, dpt_ref):
    """Recompute the corners and dzw_p = dp*e_p*relu'(z_p); returns
    (vs, xhats, dzs), lists of (C, Mq) fp32."""
    vs = [_corner(x16_ref, w16_ref, b_ref, p) for p in range(4)]
    mu = st_ref[:, 0:1]
    r = st_ref[:, 1:2]                                 # rsqrt(var + eps)
    g = g_ref[:].astype(jnp.float32)                   # (C, 1)
    be = be_ref[:].astype(jnp.float32)
    pos = g > 0
    ext = _extreme(vs, pos)
    dp = dpt_ref[0].astype(jnp.float32)                # (C, Mq)
    xhats, dzs = [], []
    taken = None
    for p in range(4):
        e = vs[p] == ext if taken is None else (vs[p] == ext) & ~taken
        taken = e if taken is None else taken | e
        xhat = (vs[p] - mu) * r
        z = g * xhat + be
        xhats.append(xhat)
        dzs.append(dp * e * (z > 0))
    return vs, xhats, dzs


def _bwd_kernel(x16_ref, w16_ref, b_ref, g_ref, be_ref, st_ref, dpt_ref,
                t_ref, g1_ref, gram_ref, r_ref):
    """t (C, 3) = [T1, T2, Sx]; g1 (4, C, 16); gram (16, 16); r (16, 1).

    Mask-free under the zeroed-lane build invariant: dz = 0 at the invalid
    lanes (the caller zero-pads dpt there), x16 = 0 there (so G1/Gram/R
    pick up nothing), and the one sum a nonzero garbage value enters — Sx,
    where xhat = (bias - mean)*r exactly — gets its closed-form
    contribution subtracted by _bwd_rule.

    The xhat contractions (previously four per-corner (C, Mq) x (Mq, 16)
    G3 dots) factor through the window-slot Gram matrix:
    G3[p] = r * (W16[p]·G + (bias - mu)·Rᵀ) with G = x16·x16ᵀ, since
    xhat_p = r*(W16[p]·x16 + bias - mu) — so the kernel emits ONE
    (16, Mq) x (Mq, 16) Gram dot and _bwd_call reconstructs G3 in
    (C, 16)-sized math outside."""
    _vs, xhats, dzs = _corners_dz(x16_ref, w16_ref, b_ref, g_ref, be_ref,
                                  st_ref, dpt_ref)

    @pl.when(pl.program_id(0) == 0)
    def _():
        t_ref[:] = jnp.zeros_like(t_ref)
        g1_ref[:] = jnp.zeros_like(g1_ref)
        gram_ref[:] = jnp.zeros_like(gram_ref)
        r_ref[:] = jnp.zeros_like(r_ref)

    x16 = x16_ref[0].astype(jnp.float32)               # (16, Mq)
    dims = (((1,), (1,)), ((), ()))    # contract over Mq (lanes of both)
    t1 = jnp.zeros((dzs[0].shape[0], 1), jnp.float32)
    t2 = jnp.zeros_like(t1)
    sx = jnp.zeros_like(t1)
    for p in range(4):
        g1_ref[p] += jax.lax.dot_general(
            dzs[p], x16, dims, preferred_element_type=jnp.float32)
        t1 += jnp.sum(dzs[p], axis=1, keepdims=True)
        t2 += jnp.sum(dzs[p] * xhats[p], axis=1, keepdims=True)
        sx += jnp.sum(xhats[p], axis=1, keepdims=True)
    gram_ref[:] += jax.lax.dot_general(
        x16, x16, dims, preferred_element_type=jnp.float32)
    t_ref[:] += jnp.concatenate([t1, t2, sx], axis=1)
    r_ref[:] += jnp.sum(x16, axis=1, keepdims=True)


def _bwd_call(x16, w16, b, gamma, beta, mu, r, dpt, C, Mq):
    B = x16.shape[0]
    stats = jnp.stack([mu, r], axis=1).astype(jnp.float32)   # (C, 2)
    t, g1, gram, rsum = pl.pallas_call(
        _bwd_kernel,
        grid=(B // NB,),
        in_specs=[
            pl.BlockSpec((NB, 16, Mq), lambda i: (i, 0, 0)),
            pl.BlockSpec((4, C, 16), lambda i: (0, 0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 2), lambda i: (0, 0)),
            pl.BlockSpec((NB, C, Mq), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((C, 3), lambda i: (0, 0)),
            pl.BlockSpec((4, C, 16), lambda i: (0, 0, 0)),
            pl.BlockSpec((16, 16), lambda i: (0, 0)),
            pl.BlockSpec((16, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 3), jnp.float32),
            jax.ShapeDtypeStruct((4, C, 16), jnp.float32),
            jax.ShapeDtypeStruct((16, 16), jnp.float32),
            jax.ShapeDtypeStruct((16, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(x16, w16, b.reshape(C, 1), gamma.reshape(C, 1).astype(jnp.float32),
      beta.reshape(C, 1).astype(jnp.float32), stats, dpt)
    # assemble the per-tap sums from the 16-slot contractions (static
    # gathers of tiny arrays — negligible XLA work)
    a1 = sum(g1[p][:, U_MAP[p]] for p in range(4))     # (C, 9)
    # G3[p] reconstructed from the Gram factorization (see _bwd_kernel)
    w16f = w16.astype(jnp.float32)
    bm = (b.astype(jnp.float32) - mu)[:, None] * rsum[:, 0][None, :]
    a3 = r[:, None] * sum(
        (jnp.dot(w16f[p], gram, precision=jax.lax.Precision.HIGHEST)
         + bm)[:, U_MAP[p]]
        for p in range(4))                             # (C, 9)
    a2 = sum(rsum[U_MAP[p], 0] for p in range(4))      # (9,)
    return t, a1, a3, a2


def _dx_kernel(x16_ref, w16_ref, b_ref, g_ref, be_ref, st_ref, dpt_ref,
               s_ref, dyt_ref):
    """Emits dyT (4, C, Mq) = per-corner dy; the caller scatters the taps
    back to input positions outside (tiny XLA formatting — dx is only live
    when the block input itself needs a gradient, which training never
    does for layer 0)."""
    _vs, xhats, dzs = _corners_dz(x16_ref, w16_ref, b_ref, g_ref, be_ref,
                                  st_ref, dpt_ref)
    t1 = s_ref[:, 0:1]
    t2 = s_ref[:, 1:2]
    n = s_ref[0, 2]
    g = g_ref[:].astype(jnp.float32)
    r = st_ref[:, 1:2]
    for p in range(4):
        dy = (r * g) * (dzs[p] - t1 / n - xhats[p] * (t2 / n))
        dyt_ref[0, p] = dy.astype(dyt_ref.dtype)


def _dx_call(x16, w16, b, gamma, beta, mu, r, t1, t2, n, dpt, H, W, C, Mq):
    B = x16.shape[0]
    stats = jnp.stack([mu, r], axis=1).astype(jnp.float32)
    sums = jnp.stack([t1, t2, jnp.full_like(t1, n)], axis=1).astype(jnp.float32)
    dyt = pl.pallas_call(
        _dx_kernel,
        grid=(B // NB,),
        in_specs=[
            pl.BlockSpec((NB, 16, Mq), lambda i: (i, 0, 0)),
            pl.BlockSpec((4, C, 16), lambda i: (0, 0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, 2), lambda i: (0, 0)),
            pl.BlockSpec((NB, C, Mq), lambda i: (i, 0, 0)),
            pl.BlockSpec((C, 3), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NB, 4, C, Mq), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 4, C, Mq), jnp.float32),
        interpret=_interpret(),
    )(x16, w16, b.reshape(C, 1), gamma.reshape(C, 1).astype(jnp.float32),
      beta.reshape(C, 1).astype(jnp.float32), stats, dpt, sums)
    # scatter dy back through the conv taps: dx[h, w] = sum_s dy_full[
    # h-dh+1, w-dw+1] * W[s], with dy_full rebuilt from the corner views
    h2, w2 = H // 2, W // 2
    dy4 = dyt.reshape(B, 2, 2, C, h2, w2 + 1)[..., :w2]   # drop garbage lanes
    dy_full = (dy4.transpose(0, 3, 4, 1, 5, 2)        # (B, C, i, pi, j, pj)
               .reshape(B, C, H, W))
    return dy_full


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_conv1_bn_relu_pool(x, kernel, bias, gamma, beta, eps=1e-5,
                             axis=None):
    """x (B, H, W, 1) -> (pooled (B, H/2, W/2, C), mean (C,), var (C,)).

    Training-mode batch statistics; the caller folds mean/var into the
    running averages.  kernel (3, 3, 1, C); H and W must be even.

    `axis`: optional mapped-axis name.  Inside shard_map over a batch-sharded
    mesh axis, the BN moments (forward) and every parameter-gradient
    reduction (backward) are psum'd over it, so the block computes GLOBAL
    batch statistics and replicated parameter gradients — the reference's
    DDP + SyncBatchNorm semantics (utils/utils.py:410-417).  Use via
    fused_conv1_bn_relu_pool_sharded, which supplies the shard_map."""
    out, _ = _fwd_impl(x, kernel, bias, gamma, beta, eps, axis)
    return out


def _fwd_impl(x, kernel, bias, gamma, beta, eps, axis=None):
    B, H, W, _ = x.shape
    C = kernel.shape[-1]
    h2, w2 = H // 2, W // 2
    Mq = h2 * (w2 + 1)
    x16 = _build_x16(x[..., 0])
    wkt = kernel.reshape(9, C).T
    w16 = _fold_w16(wkt)
    sel, s1, s2 = _fwd_call(x16, w16, bias, gamma, C, Mq)
    # the B*4*h2 zeroed garbage lanes each contributed exactly v = bias to
    # the kernel's sums (zero window dot + bias); subtract the closed form
    # BEFORE any cross-shard psum (each shard corrects its own lanes)
    n_g = B * 4 * h2
    b32 = bias.astype(jnp.float32)
    s1 = s1 - n_g * b32
    s2 = s2 - n_g * b32 * b32
    n = B * H * W
    if axis is not None:
        # cross-shard moment reduction: the only cross-sample quantity in
        # the block (one (C, 2)-sized psum per forward)
        s1 = jax.lax.psum(s1, axis)
        s2 = jax.lax.psum(s2, axis)
        n = n * jax.lax.axis_size(axis)
    mean = s1 / n
    var = s2 / n - mean * mean
    r = jax.lax.rsqrt(var + eps)
    g32 = gamma.astype(jnp.float32)
    z_sel = (g32[:, None] * (sel.astype(jnp.float32) - mean[:, None])
             * r[:, None] + beta.astype(jnp.float32)[:, None])
    pooled = (jnp.maximum(z_sel, 0.0)
              .reshape(B, C, h2, w2 + 1)[..., :w2]
              .transpose(0, 2, 3, 1)
              .astype(x.dtype))
    res = (x16, w16, wkt, bias, gamma, beta, mean, r)
    return (pooled, mean, var), res


def fused_conv1_bn_relu_pool_eval(x, kernel, bias, gamma, beta, mean, var,
                                  eps=1e-5):
    """Inference-mode block: conv + BN with RUNNING stats + relu + maxpool,
    forward only (no custom_vjp — eval paths never differentiate it).

    Same monotonicity argument as training: z = gamma*(y-mean)*r + beta is
    monotone in y with direction sign(gamma), so pool(relu(z)) ==
    relu(affine(per-window extreme)) and the full-resolution conv activation
    never exists.  This is what the HEAR conv timestamp path forwards ~13k
    (64, 96) frames through per call (reference hear/sample/conv.py:109-126),
    where XLA's eval composition round-trips the (B, F, T, C) activation
    through HBM ~3x.

    x (B, H, W, 1) -> (B, H/2, W/2, C); H, W even; kernel (3, 3, 1, C)."""
    B, H, W, _ = x.shape
    C = kernel.shape[-1]
    h2, w2 = H // 2, W // 2
    Mq = h2 * (w2 + 1)
    x16 = _build_x16(x[..., 0])
    w16 = _fold_w16(kernel.reshape(9, C).T)
    sel, _s1, _s2 = _fwd_call(x16, w16, bias, gamma, C, Mq)
    r = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    g32 = gamma.astype(jnp.float32)
    z = (g32[:, None] * (sel.astype(jnp.float32) - mean.astype(jnp.float32)[:, None])
         * r[:, None] + beta.astype(jnp.float32)[:, None])
    return (jnp.maximum(z, 0.0)
            .reshape(B, C, h2, w2 + 1)[..., :w2]
            .transpose(0, 2, 3, 1)
            .astype(x.dtype))


def _fwd_rule(x, kernel, bias, gamma, beta, eps, axis=None):
    return _fwd_impl(x, kernel, bias, gamma, beta, eps, axis)


def _bwd_rule(eps, axis, res, cotangents):
    dpooled, _dmean, _dvar = cotangents       # mean/var feed non-diff buffers
    x16, w16, wkt, bias, gamma, beta, mean, r = res
    B = x16.shape[0]
    xdt = x16.dtype
    H2, W2, C = dpooled.shape[1:]
    H, W = 2 * H2, 2 * W2
    Mq = H2 * (W2 + 1)
    n = B * H * W
    # zero-pad the garbage lane of each window row so dz vanishes there
    dpt = jnp.pad(dpooled.transpose(0, 3, 1, 2),
                  ((0, 0), (0, 0), (0, 0), (0, 1))).reshape(B, C, Mq)
    t, a1, a3, a2 = _bwd_call(x16, w16, bias, gamma, beta, mean, r, dpt,
                              C, Mq)
    # Sx picked up xhat = (bias - mean)*r at each of the B*4*H2 zeroed
    # garbage lanes (v = bias there); subtract the closed form per shard
    t = t.at[:, 2].add(-(B * 4 * H2)
                       * (bias.astype(jnp.float32) - mean) * r)
    tg = t
    if axis is not None:
        # Only the T1/T2/Sx sums need to be GLOBAL here: they feed the BN
        # chain rule multiplicatively (dx, and the -A*T/n terms of dW/db).
        # Everything returned as a parameter cotangent must stay the LOCAL
        # batch contribution — shard_map's transpose inserts the psum over
        # `axis` for replicated (P()) inputs itself (the DDP gradient
        # all-reduce), so dW/db/dgamma/dbeta below are per-shard partials
        # that are linear in the local sums given global T1/T2/n.
        tg = jax.lax.psum(t, axis)
        n = n * jax.lax.axis_size(axis)
    t1, t2, sx = tg[:, 0], tg[:, 1], t[:, 2]
    g32 = gamma.astype(jnp.float32)
    rg = r * g32
    dW = (rg[:, None] * (a1 - a2[None, :] * (t1[:, None] / n)
                         - a3 * (t2[:, None] / n))).T     # (9, C)
    db = -(rg * sx * t2) / n
    dgamma = t[:, 1]          # local contribution (see the psum note above)
    dbeta = t[:, 0]
    dy_full = _dx_call(x16, w16, bias, gamma, beta, mean, r, t1, t2, n, dpt,
                       H, W, C, Mq)
    # dx[h, w] = sum_{s, c} dy_full[c, h-(dh-1), w-(dw-1)] * W[s, c]
    dyp = jnp.pad(dy_full, ((0, 0), (0, 0), (1, 1), (1, 1)))
    wk = wkt.T                                  # (9, C)
    dx2 = jnp.zeros((B, H, W), jnp.float32)
    for s, (dh, dw) in enumerate(TAPS):
        sl = jax.lax.slice(dyp, (0, 0, 2 - dh, 2 - dw),
                           (B, C, 2 - dh + H, 2 - dw + W))
        dx2 = dx2 + jnp.einsum("bchw,c->bhw", sl, wk[s])
    dx = dx2[..., None].astype(xdt)
    return (dx, dW.reshape(3, 3, 1, C).astype(xdt), db.astype(xdt),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


fused_conv1_bn_relu_pool.defvjp(_fwd_rule, _bwd_rule)


def fused_conv1_bn_relu_pool_sharded(x, kernel, bias, gamma, beta, mesh,
                                     eps=1e-5, axis="data"):
    """Data-parallel fused block: the Pallas kernel is batch-parallel, so
    under a batch-sharded mesh it runs per-shard inside shard_map with the
    two cross-shard quantities psum'd over `axis` (BN moment partials in the
    forward, parameter-gradient partials in the backward).  Semantically
    identical to the unsharded call on the gathered batch — the reference
    wraps *every* model in DDP + SyncBatchNorm (utils/utils.py:410-417), and
    this is its TPU-native form for the one op GSPMD treats as opaque.

    x (B, H, W, 1) with B divisible by the 'data' axis size; params
    replicated.  Returns (pooled (B, H/2, W/2, C), mean (C,), var (C,))
    with mean/var computed over the GLOBAL batch."""
    from jax.sharding import PartitionSpec as P

    f = jax.shard_map(
        functools.partial(fused_conv1_bn_relu_pool, eps=eps, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), P(), P()),
        # vma tracking can't see through pallas_call outputs; replication of
        # the P() outputs/grads is established manually by the psums above
        check_vma=False,
    )
    return f(x, kernel, bias, gamma, beta)
