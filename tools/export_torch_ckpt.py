"""Convert an Orbax checkpoint from this framework into a reference-layout
PyTorch .pth, so TPU-trained weights run in the reference's own torch
pipelines (hear/sample/*.py, linear.py — they strip wrapper prefixes
themselves; SURVEY.md §7 'checkpoint interop', the export direction).

Accepts either a whole-TrainState checkpoint written by training
(params.encoder/batch_stats.encoder subtrees) or an encoder-only tree
written by tools/import_torch_ckpt.py.

Usage:
    python tools/export_torch_ckpt.py --model_type audiontt \
        --ckpt results/fsd50k/<run>/model_100 --out model_100.pth
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", required=True)
    p.add_argument("--ckpt", required=True, help="Orbax checkpoint dir")
    p.add_argument("--out", required=True, help=".pth output path")
    p.add_argument("--patch_size", nargs="+", type=int, default=[16, 16])
    p.add_argument("--n_mels", type=int, default=64)
    p.add_argument("--crop_frames", type=int, default=96)
    p.add_argument("--squeeze_excitation", action="store_true", default=False,
                   help="force SE export (auto-inferred from SEBlock_* keys)")
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp
    import torch

    from ssl_audio_tpu.config import default_config
    from ssl_audio_tpu.models.wrapper import build_encoder, is_vit
    from ssl_audio_tpu.utils import torch_export

    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(args.ckpt))
    # training checkpoints wrap the TrainState; importer output is bare
    if "state" in tree:
        tree = tree["state"]
    params = tree["params"]["encoder"]
    bstats = tree.get("batch_stats", {}).get("encoder", {}) or {}

    cfg = default_config(
        model_type=args.model_type, patch_size=args.patch_size,
        n_mels=args.n_mels, crop_frames=args.crop_frames,
    )
    if is_vit(cfg):
        enc, _dim = build_encoder(cfg)
        sd = torch_export.export_vit_state_dict(enc, params, bstats or None)
    elif args.model_type == "audiontt":
        # SE is inferred from the checkpoint itself (presence of SEBlock_*
        # params), not from default_config — whose squeeze_excitation default
        # is False, which silently dropped SE weights on export (ADVICE r3);
        # --squeeze_excitation still forces it on.
        has_se = args.squeeze_excitation or "SEBlock_0" in params.get(
            "encoder", {})
        sd = torch_export.export_audiontt_state_dict(
            {"params": params, "batch_stats": bstats},
            squeeze_excitation=has_se)
    else:
        sd = torch_export.export_resnet_state_dict(
            {"params": params, "batch_stats": bstats}, args.model_type)

    torch.save(sd, args.out)
    n = sum(v.numel() for v in sd.values())
    print(f"Exported {args.ckpt} -> {args.out} ({args.model_type}, "
          f"{len(sd)} tensors, {n/1e6:.2f}M params)")


if __name__ == "__main__":
    main()
