"""Microbenchmarks for the fused conv-block kernels (ops/fused_conv.py):
(x9q/wkt variable names predate the X16 layout: x9q holds X16 (B, 16, Mq)
and wkt holds W16 (4, C, 16).)
times each pallas_call and the X9 build in isolation with the slope method,
so kernel iterations don't need a full train-step compile.

    python tools/bench_fused.py --batch 256 [--hs 16 32] [--dtype bf16]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(fn, args, n=8, reps=3):
    """Median-of-reps slope timing: fn must take (key, *args) and return a
    scalar; iterations inside a scan are key-folded so XLA can't hoist."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make(n):
        @jax.jit
        def run(key, *a):
            def body(c, i):
                return c + fn(jax.random.fold_in(key, i), *a), 0.0

            total, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return total

        return run

    f1, f2 = make(n), make(2 * n)
    r1 = float(f1(jax.random.key(0), *args))
    r2 = float(f2(jax.random.key(0), *args))
    assert r1 != 0.0 and r2 != 0.0

    def t(f, k):
        best = float("inf")
        for rep in range(reps):
            t0 = time.time()
            float(f(jax.random.key(rep + 1), *args))
            best = min(best, time.time() - t0)
        return best

    t1, t2 = t(f1, 1), t(f2, 2)
    return (t2 - t1) / n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--H", type=int, default=64)
    p.add_argument("--W", type=int, default=96)
    p.add_argument("--C", type=int, default=64)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--parts", nargs="+",
                   default=["build", "fwd", "bwd", "dx", "full", "xla"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssl_audio_tpu.ops import fused_conv as fc

    B, H, W, C = args.batch, args.H, args.W, args.C
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 1)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.3, dt)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, dt)
    g = jnp.asarray(1 + 0.1 * rng.standard_normal(C), dt)
    be = jnp.asarray(0.1 * rng.standard_normal(C), dt)
    dp = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, C)), dt)

    h2, w2 = H // 2, W // 2
    Mq = h2 * (w2 + 1)                        # flat-shift layout (+1 garbage lane/row)
    x9q = fc._build_x16(x[..., 0])
    wkt = fc._fold_w16(k.reshape(9, C).T)
    (pooled, mean, var), res = fc._fwd_impl(x, k, b, g, be, 1e-5)
    r = jax.lax.rsqrt(var + 1e-5)
    dpt = jnp.pad(dp.transpose(0, 3, 1, 2),
                  ((0, 0), (0, 0), (0, 0), (0, 1))).reshape(B, C, Mq)
    print(f"NB={fc.NB} dtype={args.dtype} B={B}")

    def run(name, fn, a):
        ms = slope_time(fn, a, n=args.n) * 1e3
        print(f"{name:>22s}: {ms:8.3f} ms")

    if "build" in args.parts:
        def build(key, x):
            xx = x + jax.random.uniform(key, (1,), x.dtype)
            a = fc._build_x16(xx[..., 0])
            return a.astype(jnp.float32).sum()

        run("x9q build", build, (x,))

    if "fwd" in args.parts:
        def fwd(key, x9q, wkt, b, g):
            xx = x9q + jax.random.uniform(key, (1,), x9q.dtype)
            sel, s1, s2 = fc._fwd_call(xx, wkt, b, g, C, Mq)
            return sel.astype(jnp.float32).sum() + s1.sum() + s2.sum()

        run("fwd kernel", fwd, (x9q, wkt, b, g))

    if "bwd" in args.parts:
        def bwd(key, x9q, wkt, b, g, be, mean, r, dpt):
            dd = dpt + jax.random.uniform(key, (1,), dpt.dtype)
            t, a1, a3, a2 = fc._bwd_call(x9q, wkt, b, g, be, mean, r, dd,
                                         C, Mq)
            return t.sum() + a1.sum() + a3.sum() + a2.sum()

        run("bwd kernel", bwd, (x9q, wkt, b, g, be, mean, r, dpt))

    if "dx" in args.parts:
        t1 = jnp.zeros(C, jnp.float32)
        t2 = jnp.zeros(C, jnp.float32)

        def dxf(key, x9q, wkt, b, g, be, mean, r, dpt):
            dd = dpt + jax.random.uniform(key, (1,), dpt.dtype)
            dx = fc._dx_call(x9q, wkt, b, g, be, mean, r, t1, t2,
                             B * H * W, dd, H, W, C, Mq)
            return dx.astype(jnp.float32).sum()

        run("dx kernel", dxf, (x9q, wkt, b, g, be, mean, r, dpt))

    if "full" in args.parts:
        def full(key, x, k, b, g, be, dp):
            xx = x + jax.random.uniform(key, (1,), x.dtype)

            def f(k, b, g, be):
                p, _, _ = fc.fused_conv1_bn_relu_pool(xx, k, b, g, be)
                return jnp.sum(p.astype(jnp.float32) * dp.astype(jnp.float32))

            l, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(k, b, g, be)
            return l + grads[0].astype(jnp.float32).sum()

        run("full fwd+bwd (fused)", full, (x, k, b, g, be, dp))

    if "xla" in args.parts:
        def xla(key, x, k, b, g, be, dp):
            xx = x + jax.random.uniform(key, (1,), x.dtype)

            def f(k, b, g, be):
                y = jax.lax.conv_general_dilated(
                    xx, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                mean = y.mean(axis=(0, 1, 2))
                var = (y * y).mean(axis=(0, 1, 2)) - mean * mean
                z = g * (y - mean) * jax.lax.rsqrt(var + 1e-5) + be
                a = jnp.maximum(z, 0)
                p = jax.lax.reduce_window(a, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                return jnp.sum(p.astype(jnp.float32) * dp.astype(jnp.float32))

            l, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(k, b, g, be)
            return l + grads[0].astype(jnp.float32).sum()

        run("full fwd+bwd (XLA)", xla, (x, k, b, g, be, dp))


if __name__ == "__main__":
    main()
