"""FLOPs / parameter profiling (reference utils/flops.py, which wraps the
deepspeed profiler) via XLA's own cost analysis.

Usage:
    python -m ssl_audio_tpu.utils.flops --model_type vit_base
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def model_flops(cfg, batch_size: int = 2, train: bool = False) -> dict:
    """FLOPs and params of one encoder forward on a (B,1,n_mels,crop_frames)
    batch (the reference profiles (2,1,64,96), flops.py:16-51)."""
    from ssl_audio_tpu.models.wrapper import build_encoder, is_vit

    enc, dim = build_encoder(cfg)
    x = jnp.zeros((batch_size, 1, cfg.n_mels, cfg.crop_frames), jnp.float32)
    rngs = {"params": jax.random.key(0)}
    variables = enc.init(rngs, x, train=False)

    def fwd(variables, x):
        return enc.apply(variables, x, train=False)

    lowered = jax.jit(fwd).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", -1.0)) if cost else -1.0
    return {
        "model_type": cfg.model_type,
        "params": count_params(variables["params"]),
        "flops_per_batch": flops,
        "flops_per_sample": flops / batch_size if flops > 0 else -1.0,
        "embed_dim": dim,
    }


def main(argv=None):
    from ssl_audio_tpu.config import config_from_args

    cfg = config_from_args(argv)
    info = model_flops(cfg)
    gf = info["flops_per_sample"] / 1e9
    print(
        f"{info['model_type']}: params={info['params']/1e6:.2f}M "
        f"flops/sample={gf:.3f} GFLOPs embed_dim={info['embed_dim']}"
    )
    return info


if __name__ == "__main__":
    main()
