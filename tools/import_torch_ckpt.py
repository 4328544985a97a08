"""Convert a reference PyTorch checkpoint (.pth) into this framework's Orbax
params layout, so released Audio-Barlow-Twins weights can be probed, HEAR-
evaluated, or fine-tuned here (SURVEY.md §7 'checkpoint interop').

Usage:
    python tools/import_torch_ckpt.py --model_type vitc_base \
        --patch_size 16 8 --pth results/.../model_100.pth --out ckpts/vitc_base_100
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", required=True)
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--patch_size", nargs="+", type=int, default=[16, 16])
    p.add_argument("--n_mels", type=int, default=64)
    p.add_argument("--crop_frames", type=int, default=96)
    p.add_argument("--squeeze_excitation", action="store_true", default=False,
                   help="force SE import (auto-inferred from the .pth keys)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.models.wrapper import build_encoder, is_vit
    from ssl_audio_tpu.utils import torch_import

    se = args.squeeze_excitation
    if args.model_type == "audiontt" and not se:
        # infer SE from the checkpoint itself — default_config's
        # squeeze_excitation is always False, which made SE-variant AudioNTT
        # checkpoints unimportable via the CLI (ADVICE r3, export twin)
        import torch

        sd = torch.load(args.pth, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd and not hasattr(
                sd["model"], "numel"):
            sd = sd["model"]
        se = any("excitation" in k for k in sd.keys())
    cfg = default_config(
        model_type=args.model_type, patch_size=args.patch_size,
        n_mels=args.n_mels, crop_frames=args.crop_frames,
        squeeze_excitation=se,
    )
    enc, dim = build_encoder(cfg)
    x = jnp.zeros((1, 1, cfg.n_mels, cfg.crop_frames), jnp.float32)
    variables = dict(enc.init({"params": jax.random.key(0)}, x, train=False))

    if is_vit(cfg):
        if "batch_stats" in variables:
            params, bstats = torch_import.load_torch_vit_params(
                args.pth, variables["params"], variables["batch_stats"]
            )
            out = {"params": {"encoder": params},
                   "batch_stats": {"encoder": bstats}}
        else:
            params = torch_import.load_torch_vit_params(args.pth, variables["params"])
            out = {"params": {"encoder": params}, "batch_stats": {"encoder": {}}}
    elif args.model_type == "audiontt":
        # AudioNTT params nest one level ({"encoder": {...}}); the importer
        # takes/returns that inner tree keyed as "encoder"
        conv = torch_import.load_torch_audiontt_variables(
            args.pth, variables, squeeze_excitation=cfg.squeeze_excitation,
        )
        out = {"params": {"encoder": {"encoder": conv["params"]["encoder"]}},
               "batch_stats": {"encoder": {"encoder": conv["batch_stats"]["encoder"]}}}
    else:
        conv = torch_import.load_torch_resnet_variables(args.pth, variables, args.model_type)
        out = {"params": {"encoder": conv["params"]},
               "batch_stats": {"encoder": conv["batch_stats"]}}

    import os

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), out, force=True)
    ckptr.wait_until_finished()
    n = sum(p.size for p in jax.tree.leaves(out["params"]))
    print(f"Imported {args.pth} -> {args.out} ({args.model_type}, {n/1e6:.2f}M params)")


if __name__ == "__main__":
    main()
