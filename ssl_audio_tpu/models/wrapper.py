"""Encoder selection: --model_type string -> Flax module + feature dim
(reference model.py:57-103 ModelWrapper)."""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ssl_audio_tpu.models import audiontt, resnet, vit


def build_encoder(cfg, mesh=None) -> Tuple[nn.Module, int]:
    """Returns (encoder_module, feature_dim).

    `mesh`: the training mesh, when known (Trainer passes its own).  A
    multi-device 1-D 'data' mesh routes the AudioNTT fused kernel through
    its shard_map form (ops/fused_conv.fused_conv1_bn_relu_pool_sharded) —
    batch-sharded kernel, psum'd BN moments/grads — so the flagship config
    trains data-parallel like every reference model
    (reference utils/utils.py:410-417 wraps ALL models in DDP)."""
    mt = cfg.model_type
    if mt == "resnet50":
        enc = resnet.resnet50()
    elif mt == "resnet50_ReGP_NRF":
        enc = resnet.resnet50_ReGP_NRF()
    elif mt == "resnet18":
        enc = resnet.resnet18()
    elif mt == "resnet18_ReGP_NRF":
        enc = resnet.resnet18_ReGP_NRF()
    elif mt == "audiontt":
        assert cfg.n_mels == 64, (
            f"n_mels must be 64 to use AudioNTT encoder (n_mels set to {cfg.n_mels})"
        )
        # the shard_map form needs a pure 1-D 'data' mesh with the batch
        # divisible across it; under TP/2-D meshes the auto-psum of
        # replicated-param cotangents would double-count over 'model'
        shardable = (
            mesh is not None
            and tuple(mesh.axis_names) == ("data",)
            and mesh.shape["data"] > 1
            and cfg.batch_size % mesh.shape["data"] == 0
        )
        fused = getattr(cfg, "fused_conv", None)
        if fused is None:
            # auto: on for TPU training — single chip (PERF.md r3: −31%
            # fp32 step) or any 1-D data mesh (r4: shard_map form); off on
            # CPU (interpret mode) and on meshes the kernel can't shard
            import jax

            fused = jax.default_backend() == "tpu" and (
                jax.device_count() == 1 or shardable)
        reorder = getattr(cfg, "pool_reorder", None)
        if reorder is None:
            # auto: pure XLA ops, GSPMD-shardable — on for any TPU training;
            # off on CPU so test oracles keep the literal flax composition
            import jax

            reorder = jax.default_backend() == "tpu"
        enc = audiontt.AudioNTT2022(
            squeeze_excitation=cfg.squeeze_excitation,
            fused_conv=bool(fused),
            pool_reorder=bool(reorder),
            fused_mesh=mesh if (bool(fused) and shardable) else None,
        )
    elif "vit" in mt:
        conv_stem = mt.split("_")[0] == "vitc"
        size = mt.split("_")[-1]
        remat = bool(getattr(cfg, "remat", False))
        # fused attention: per-sample op, shard_map over a pure 1-D 'data'
        # mesh (no cross-shard quantities at all); off under TP/2-D meshes
        # where heads are Megatron-sharded over 'model'
        fa_shardable = (
            mesh is not None
            and tuple(mesh.axis_names) == ("data",)
            and mesh.shape["data"] > 1
            and cfg.batch_size % mesh.shape["data"] == 0
        )
        lb = getattr(cfg, "layout_barrier", None)
        if lb is None:
            # auto: OFF pending the full-step A/B (the isolated fold probe
            # shows folded transposes cost ~45% of GEMM throughput —
            # tools/gemm_probe.py — but the full-graph verdict decides the
            # default; see PERF.md "Layout barriers (r4)")
            lb = False
        fa = getattr(cfg, "fused_attention", None)
        if fa is None:
            # auto: OFF — the Pallas kernel measured NEUTRAL-to-negative on
            # the full ViT-B B=128 train step (41.77 vs 41.27 ms same-day
            # A/B) and 7.5x slower in isolation (0.454 vs 0.060 ms/layer
            # fwd+bwd): XLA's full-graph lowering already folds the
            # attention formatting into the surrounding GEMMs.  Full
            # adjudication in PERF.md "Fused attention (r4)".  Opt-in via
            # --fused_attention for future chips/shapes.
            fa = False
        if cfg.dataset == "cifar10":
            enc = vit.get_mae_vit(
                size, cfg.patch_size, conv_stem,
                use_learned_pos_embd=cfg.use_learned_pos_embd,
                img_size=(32, 32), in_chans=3, remat=remat,
                fused_attention=bool(fa),
                fused_attn_mesh=mesh if (bool(fa) and fa_shardable) else None,
                layout_barrier=bool(lb),
            )
        else:
            enc = vit.get_mae_vit(
                size, cfg.patch_size, conv_stem,
                use_learned_pos_embd=cfg.use_learned_pos_embd,
                img_size=(cfg.n_mels, cfg.crop_frames),
                use_decoder=cfg.masked_recon, remat=remat,
                fused_attention=bool(fa),
                fused_attn_mesh=mesh if (bool(fa) and fa_shardable) else None,
                layout_barrier=bool(lb),
            )
    else:
        raise NotImplementedError(f"Model type {mt} is not supported")
    return enc, enc.embed_dim


def is_vit(cfg) -> bool:
    return "vit" in cfg.model_type
