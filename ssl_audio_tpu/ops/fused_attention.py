"""Fused multi-head self-attention Pallas kernel for short ViT sequences.

Why: the XProf trace of the ViT-B B=128 train step (PERF.md r4) shows the
attention *region* costs 20.0 of 47.2 ms device-busy — yet the attention
math itself is <1 GFLOP.  XLA lowers the reference formulation
(reference mae.py:102-141: qkv GEMM -> reshape(B,N,3,H,hd) -> 5-D
transpose -> two [B*H, N, N]-batched dot_generals -> softmax -> transpose
back) into

  * 24 materialized [128,25,3,12,64] layout copies   (5.9 ms/step)
  * batched 25-token GEMMs running at 1.7-3.6 GF/s   (4.7 ms/step)
  * softmax loop fusions over [B,H,25,25]            (2.3 ms/step)

because a 25x25-per-head dot cannot tile the 128x128 MXU and the (3,H,hd)
unpack forces a minor-dim relayout.  A first kernel design that looped
(batch row, head) and issued per-head (N,hd)x(hd,N) dots measured SLOWER
than XLA (48.2 vs 41.5 ms full step, 2026-08-18): B*H*2 = 3,072
sequential MXU ops of ~80 KFLOP each are latency-bound, not
throughput-bound.  This version packs ALL heads of a sample into single
MXU-shaped dots, and — because Mosaic cannot lower lane-dimension
concatenates or sub-lane-aligned slices of narrow pieces — expresses every
pack/unpack as an EXACT 0/1 matmul or a full-width masked elementwise op:

  * K and V are expanded to block-diagonal slabs Kexp/Vblk (H*N, C)
    (rows [h*N:(h+1)*N] hold head h's (N, hd) lane slice, zeros
    elsewhere) via  tile = FoldT (H*N, N) @ K  followed by a lane
    head-mask multiply.  FoldT = H vertically stacked N-identities,
    built from iota — the tile dot selects exactly one input element
    per output (no accumulation error);
  * scores for every head come from ONE dot  S (N, H*N) = Q (N, C) @
    Kexp^T — the zero off-head lanes make each packed column exactly
    the per-head score.  H times more MACs than the minimal einsum,
    but on <1 GFLOP total that is the cheap currency;
  * per-head softmax runs in f32 with full-width segment-masked
    max/sum reductions (same per-head max subtraction as the einsum
    path — no cross-head underflow exposure);
  * the output needs NO unpacking: O (N, C) = P (N, H*N) @ Vblk lands
    directly in the interleaved head layout;
  * q/k/v arrive as separate (B, N, C) operands — the caller slices the
    raw (B, N, 3C) qkv GEMM output in XLA (contiguous copies XLA fuses
    into the kernel's input DMA), so no in-kernel lane offsets exist.

The backward kernel recomputes S and P from the q/k/v residuals
(flash-style — no (B, H*N, H*N) probs tensor ever touches HBM), emits
dq/dk/dv in natural layout (dk/dv fold back from block rows via the
Fold (N, H*N) 0/1 matmul), plus the key-bias cotangent.

Numerics: dots cast operands to bf16 with f32 accumulation — exactly what
XLA's DEFAULT precision does on the TPU MXU for the einsum path this
replaces (the trace's attention feeds are bf16 copies).  The pack/fold
0/1 matmuls are exact element selection (bf16 in/out values pass through
unchanged).  Softmax and its VJP run in f32.  Parity vs the einsum path
is bf16-rounding-level (tests/test_fused_attention.py).

Scope: hd <= 128, N <= MAX_SEQ and H*N <= MAX_PACKED keep the packed
slabs in VMEM; the ViT family here is N in {18, 25, 49}, hd=64.  Callers
fall back to the einsum path outside that envelope (models/vit.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MAX_SEQ = 256          # per-head (N, N) softmax segments stay tiny in VMEM
MAX_PACKED = 1024      # H*N rows of the packed slabs (bf16 (H*N, C) <= 2 MB)
_NB_CANDIDATES = (8, 4, 2, 1)
_NEG = -1e30           # segment-mask fill for per-head max


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_nb(batch: int) -> int:
    for nb in _NB_CANDIDATES:
        if batch % nb == 0:
            return nb
    return 1


def _mxu(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """bf16-operand / f32-accumulate dot (XLA DEFAULT-precision parity)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


class _Consts:
    """Per-shape constants, computed once per kernel invocation (hoisted
    out of the nb unroll by construction)."""

    def __init__(self, heads: int, seq: int, hd: int):
        HN, C = heads * seq, heads * hd
        # FoldT (HN, N): H stacked N-identities -> tile matmul (exact copy)
        self.fold_t = (_iota2((HN, seq), 0) % seq
                       == _iota2((HN, seq), 1)).astype(jnp.bfloat16)
        # Fold (N, HN): gathers row (h_c, m) -> row m in the fold matmul
        self.fold = (_iota2((seq, HN), 0)
                     == _iota2((seq, HN), 1) % seq).astype(jnp.bfloat16)
        # (HN, C) lane head-mask: row-block h keeps only head h's lanes
        self.blkmask = (_iota2((HN, C), 0) // seq
                        == _iota2((HN, C), 1) // hd).astype(jnp.bfloat16)
        # (1, HN) lane -> head index, for segment-masked reductions
        self.lane_head = _iota2((1, HN), 1) // seq
        self.heads, self.seq, self.hd = heads, seq, hd

    def expand(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, C) -> block-diagonal (H*N, C) f32, exact element selection."""
        return _mxu(self.fold_t, x, ((1,), (0,))) * self.blkmask

    def seg_softmax(self, s: jnp.ndarray) -> jnp.ndarray:
        """Per-head softmax over the (N, H*N) packed scores, f32, with
        per-head max subtraction — value-matches jax.nn.softmax on each
        head's (N, N) block."""
        m_exp = jnp.zeros_like(s)
        d_exp = jnp.zeros_like(s)
        for h in range(self.heads):
            seg = self.lane_head == h                      # (1, HN)
            m_h = jnp.max(jnp.where(seg, s, _NEG), axis=-1, keepdims=True)
            m_exp = m_exp + jnp.where(seg, m_h, 0.0)
        e = jnp.exp(s - m_exp)
        for h in range(self.heads):
            seg = self.lane_head == h
            d_h = jnp.sum(jnp.where(seg, e, 0.0), axis=-1, keepdims=True)
            d_exp = d_exp + jnp.where(seg, d_h, 0.0)
        return e / d_exp

    def seg_center(self, t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """Softmax VJP: ds = t - p * seg_broadcast(seg_sum(t)) where
        t = p * dp, all f32 full-width."""
        c_exp = jnp.zeros_like(t)
        for h in range(self.heads):
            seg = self.lane_head == h
            c_h = jnp.sum(jnp.where(seg, t, 0.0), axis=-1, keepdims=True)
            c_exp = c_exp + jnp.where(seg, c_h, 0.0)
        return t - p * c_exp


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(nb: int, heads: int, hd: int, scale: float,
                q_ref, k_ref, v_ref, bias_ref, out_ref):
    cc = _Consts(heads, q_ref.shape[1], hd)
    for i in range(nb):
        kexp = cc.expand(k_ref[i])                         # (HN, C)
        vblk = cc.expand(v_ref[i])
        # every head's scores in one MXU dot: contract full-C lanes; the
        # zero off-head lanes of kexp select head h on rows [h*N:(h+1)*N]
        s = _mxu(q_ref[i], kexp, ((1,), (1,))) * scale     # (N, HN)
        s = s + bias_ref[i]                                # (1, HN)
        p = cc.seg_softmax(s)
        out_ref[i] = _mxu(p, vblk, ((1,), (0,))).astype(out_ref.dtype)


def _fwd_call(q, k, v, bias_tiled, heads: int, scale: float) -> jnp.ndarray:
    B, N, C = q.shape
    hd = C // heads
    HN = heads * N
    nb = _pick_nb(B)
    bspec = pl.BlockSpec((nb, N, C), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nb, heads, hd, scale),
        grid=(B // nb,),
        in_specs=[bspec, bspec, bspec,
                  pl.BlockSpec((nb, 1, HN), lambda i: (i, 0, 0))],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        interpret=_interpret(),
    )(q, k, v, bias_tiled)


# ---------------------------------------------------------------------------
# backward (flash-style: recompute S and P from the q/k/v residuals)
# ---------------------------------------------------------------------------

def _bwd_kernel(nb: int, heads: int, hd: int, scale: float,
                q_ref, k_ref, v_ref, bias_ref, dout_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    cc = _Consts(heads, q_ref.shape[1], hd)
    for i in range(nb):
        q = q_ref[i]
        kexp = cc.expand(k_ref[i])
        vblk = cc.expand(v_ref[i])
        s = _mxu(q, kexp, ((1,), (1,))) * scale
        s = s + bias_ref[i]
        p = cc.seg_softmax(s)                              # (N, HN) f32
        do = dout_ref[i]                                   # (N, C)

        # dV in block rows (head h's true lanes at its own slice)
        dvblk = _mxu(p, do, ((0,), (0,)))                  # (HN, C)
        # dP: vblk's zero off-head lanes make each packed column exact
        dp = _mxu(do, vblk, ((1,), (1,)))                  # (N, HN)
        ds = cc.seg_center(dp * p, p)                      # (N, HN) f32
        dbias_ref[i] = jnp.sum(ds, axis=0, keepdims=True)  # (1, HN)

        dq = _mxu(ds, kexp, ((1,), (0,))) * scale          # (N, C)
        dkblk = _mxu(ds, q, ((0,), (0,))) * scale          # (HN, C)
        # fold block rows back to natural (N, C): exact element selection
        dk = _mxu(cc.fold, dkblk * cc.blkmask, ((1,), (0,)))
        dv = _mxu(cc.fold, dvblk * cc.blkmask, ((1,), (0,)))
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, bias_tiled, dout, heads: int, scale: float):
    B, N, C = q.shape
    hd = C // heads
    HN = heads * N
    nb = _pick_nb(B)
    bspec = pl.BlockSpec((nb, N, C), lambda i: (i, 0, 0))
    hspec = pl.BlockSpec((nb, 1, HN), lambda i: (i, 0, 0))
    dq, dk, dv, dbias_tiled = pl.pallas_call(
        functools.partial(_bwd_kernel, nb, heads, hd, scale),
        grid=(B // nb,),
        in_specs=[bspec, bspec, bspec, hspec, bspec],
        out_specs=[bspec, bspec, bspec, hspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), q.dtype),
            jax.ShapeDtypeStruct((B, N, C), q.dtype),
            jax.ShapeDtypeStruct((B, N, C), q.dtype),
            jax.ShapeDtypeStruct((B, 1, HN), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, bias_tiled, dout)
    # fold the tiled cotangent back to per-key: bias was tiled H times
    dbias = dbias_tiled.reshape(B, heads, N).sum(axis=1)
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

def _tile_bias(key_bias: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, N) f32 -> (B, 1, H*N): lane segment h repeats the bias (XLA-side,
    a trivial broadcast copy)."""
    B, N = key_bias.shape
    return jnp.tile(key_bias.astype(jnp.float32).reshape(B, 1, N),
                    (1, 1, heads))


def _split_qkv(qkv: jnp.ndarray):
    """XLA-side contiguous lane slices (fused into the kernel input DMA);
    keeps ALL lane offsets out of the Mosaic kernel."""
    C = qkv.shape[-1] // 3
    return qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_attention(qkv: jnp.ndarray, key_bias: jnp.ndarray,
                    num_heads: int) -> jnp.ndarray:
    """Multi-head self-attention over the raw qkv projection output.

    qkv      (B, N, 3C) — columns [q | k | v], head h at columns h*hd
             within each third (the natural x @ qkv_kernel layout of
             models/vit.py AttentionKBiasZero; reference mae.py:102-141).
    key_bias (B, N) additive pre-softmax logit bias per KEY (broadcast
             over heads and queries) — the token-mask bias.  Pass zeros
             when unmasked.
    Returns  (B, N, C) in the same dtype as qkv.
    """
    q, k, v = _split_qkv(qkv)
    scale = float((q.shape[-1] // num_heads) ** -0.5)
    return _fwd_call(q, k, v, _tile_bias(key_bias, num_heads), num_heads,
                     scale)


def _vjp_fwd(qkv, key_bias, num_heads):
    out = fused_attention(qkv, key_bias, num_heads)
    return out, (qkv, key_bias)


def _vjp_bwd(num_heads, res, dout):
    qkv, key_bias = res
    q, k, v = _split_qkv(qkv)
    scale = float((q.shape[-1] // num_heads) ** -0.5)
    dq, dk, dv, dbias = _bwd_call(q, k, v, _tile_bias(key_bias, num_heads),
                                  dout, num_heads, scale)
    return (jnp.concatenate([dq, dk, dv], axis=-1),
            dbias.astype(jnp.float32))


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def supports(batch: int, seq: int, dim: int, heads: int) -> bool:
    """Shape envelope the kernel handles (callers fall back to einsum)."""
    if dim % heads:
        return False
    hd = dim // heads
    return (hd % 8 == 0 and hd <= 128 and 1 <= seq <= MAX_SEQ
            and heads * seq <= MAX_PACKED and batch >= 1)


def fused_attention_sharded(qkv: jnp.ndarray, key_bias: jnp.ndarray,
                            num_heads: int, mesh,
                            axis: str = "data") -> jnp.ndarray:
    """shard_map form for a 1-D data mesh: attention is per-sample, so the
    kernel runs on each batch shard with NO cross-shard quantities (unlike
    fused_conv's BN moments).  GSPMD treats pallas_call as opaque and would
    otherwise gather the batch (the reference trains every model under DDP,
    utils/utils.py:410-417 — this is the TPU-native equivalent)."""
    from jax.sharding import PartitionSpec as P

    f = jax.shard_map(
        lambda q, b: fused_attention(q, b, num_heads),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        # vma tracking can't see through pallas_call outputs; every output
        # here is batch-sharded, nothing replicated to track
        check_vma=False,
    )
    return f(qkv, key_bias)
