"""Isolated A/B of the attention region: Pallas fused kernel vs the einsum
composition XLA lowers (models/vit.py AttentionKBiasZero), fwd+bwd, at the
ViT-B training shape.  Slope-timed (two scan lengths) per CLAUDE.md.

    python tools/bench_attention.py --batch 128 --seq 25 --dim 768 --heads 12
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def einsum_attention(qkv, bias, heads):
    import jax
    import jax.numpy as jnp

    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    x = qkv.reshape(B, N, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = x[0], x[1], x[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
    attn = attn + bias[:, None, None, :]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(B, N, C)


def slope_time(make_scan, n_lo=10, n_hi=40, reps=3):
    """Per-step seconds from the slope between two scan lengths (cancels
    the fixed dispatch+fetch tunnel cost)."""
    f_lo, f_hi = make_scan(n_lo), make_scan(n_hi)
    a = float(f_lo(0))
    float(f_hi(0))
    best = float("inf")
    for rep in range(reps):
        t0 = time.time()
        b = float(f_lo(rep + 1))
        t_lo = time.time() - t0
        t0 = time.time()
        c = float(f_hi(rep + 1))
        t_hi = time.time() - t0
        assert b != a and c != a
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=25)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--fwd_only", action="store_true")
    p.add_argument("--out", type=str, default="attn_bench.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl_audio_tpu.ops.fused_attention import fused_attention

    B, N, C, H = args.batch, args.seq, args.dim, args.heads
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)), dt)
    bias = jnp.zeros((B, N), jnp.float32)
    print(f"backend={jax.default_backend()} B={B} N={N} C={C} H={H} "
          f"dtype={args.dtype} fwd_only={args.fwd_only}")

    # parity sanity on the real backend
    ref = np.asarray(einsum_attention(qkv[:8], bias[:8], H), np.float32)
    got = np.asarray(fused_attention(qkv[:8], bias[:8], H), np.float32)
    print(f"parity max|diff| = {np.abs(got - ref).max():.2e} "
          f"(scale {np.abs(ref).max():.2f})")

    def make_scan_for(fn):
        if args.fwd_only:
            def step(x):
                return fn(x, bias, H).astype(jnp.float32).mean()
        else:
            def step(x):
                def loss(x):
                    return fn(x, bias, H).astype(jnp.float32).mean()
                l, g = jax.value_and_grad(loss)(x)
                return l + g.astype(jnp.float32).mean()

        def make(n):
            @jax.jit
            def scanned(seed):
                def body(acc, i):
                    x = qkv + (seed + i).astype(dt) * jnp.asarray(1e-3, dt)
                    return acc + step(x), None
                acc, _ = jax.lax.scan(
                    body, jnp.float32(seed) * 1e-3, jnp.arange(n))
                return acc
            return scanned
        return make

    rows = {}
    for name, fn in [("einsum", einsum_attention), ("fused", fused_attention)]:
        sec = slope_time(make_scan_for(fn))
        rows[name] = {"ms_per_step": round(sec * 1e3, 3)}
        print(name, rows[name])
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
