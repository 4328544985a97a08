"""Attention layout ablation for the ViT-B train step.

The B=128 token-drop XProf trace bills 5.6 ms/step to "data formatting"
(transposes/copies around the attention reshapes) and 3.5 ms to async
copies (PERF.md).  The current AttentionKBiasZero materializes a 5-D
transpose (B,N,3,H,hd)->(3,B,H,N,hd) before the score matmuls and another
(B,H,N,hd)->(B,N,H,hd) after.  The candidate layout keeps tokens leading
and lets einsum fold the head-major access into the dot_generals:

    q,k,v: (B, N, H, hd) slices (no transpose)
    scores:  bnhd,bmhd->bhnm
    context: bhnm,bmhd->bnhd  (reshape to (B,N,C) is layout-free)

Same math bit-for-bit in exact arithmetic; this tool slope-times the FULL
train step (tools/mfu.py methodology) with each variant on the real chip.

    python tools/attn_ablation.py --batch 128 --out attn_ablation.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_patched_class():
    """Subclass of AttentionKBiasZero with a bnhd-layout @compact __call__ —
    identical math; swapping the vit module global reroutes Block's
    construction site (name="attn" and the param tree are unchanged)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from ssl_audio_tpu.models import vit as vit_lib
    from ssl_audio_tpu.models.vit import xavier_uniform

    class AttentionBNHD(vit_lib.AttentionKBiasZero):
        @nn.compact
        def __call__(self, x, key_bias=None, return_attention=False):
            B, N, C = x.shape
            H = self.num_heads
            hd = C // H
            qkv_w = self.param("qkv_kernel", xavier_uniform, (C, 3 * C))
            qkv = x @ qkv_w
            if self.qkv_bias:
                q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
                v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
                qkv = qkv + jnp.concatenate(
                    [q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv.reshape(B, N, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
            if key_bias is not None:
                attn = attn + key_bias
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
            out = nn.Dense(C, kernel_init=xavier_uniform, name="proj")(out)
            if return_attention:
                return out, attn
            return out

    return AttentionBNHD


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vit_base")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--n_steps", type=int, default=10)
    p.add_argument("--token_drop", action="store_true", default=True)
    p.add_argument("--out", default="attn_ablation.json")
    args = p.parse_args(argv)

    from ssl_audio_tpu.models import vit as vit_lib
    from tools.mfu import measure

    rows = []
    for name in ("bhnd_current", "bnhd_candidate"):
        if name.startswith("bnhd"):
            vit_lib.AttentionKBiasZero = _make_patched_class()
        r = measure(args.model, args.batch, n_steps=args.n_steps,
                    token_drop=args.token_drop)
        r["layout"] = name
        rows.append(r)
        print(json.dumps(r))
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
