"""Export Flax param trees as reference-layout PyTorch state dicts (.pth).

The inverse of torch_import: weights trained HERE load into the REFERENCE's
own torch models (models/mae.py, model.py, models/resnet.py) with
`load_state_dict(..., strict=True)`, so a reference user can take a
TPU-trained checkpoint back into their torch HEAR/linear-eval pipelines
(SURVEY.md §7 'checkpoint interop', now bidirectional).

Conventions (reverse of torch_import): flax Conv (kh, kw, I, O) -> torch
(O, I, kh, kw); Dense (I, O) -> (O, I); BN scale/bias -> weight/bias with
running stats from batch_stats and a zero `num_batches_tracked` (present in
every torch BatchNorm state dict; the reference never reads it).  Fixed
sin-cos positional tables — module constants here, `requires_grad=False`
Parameters in the reference (models/mae.py:202,218) — are recomputed and
emitted so the key set matches exactly.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _t(x):
    import torch

    # copy: jax arrays expose read-only buffers torch would warn about
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def _conv(w):
    return _t(np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1)))


def _linear(w):
    return _t(np.transpose(np.asarray(w, np.float32), (1, 0)))


def _put_bn(sd: Dict, prefix: str, scale, bias, mean, var) -> None:
    import torch

    sd[f"{prefix}.weight"] = _t(scale)
    sd[f"{prefix}.bias"] = _t(bias)
    sd[f"{prefix}.running_mean"] = _t(mean)
    sd[f"{prefix}.running_var"] = _t(var)
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------

def export_vit_state_dict(model, params, batch_stats: Optional[dict] = None):
    """model: the Flax MAE-ViT module (for grid_size/embed_dim when the
    pos-embed is a fixed sin-cos constant rather than a learned param);
    params/batch_stats: its variables.  Returns a torch state dict loading
    strict into the reference's get_mae_vit(...) of the same shape."""
    from ssl_audio_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    sd: Dict = {}
    sd["cls_token"] = _t(params["cls_token"])
    gh, gw = model.grid_size()
    if "pos_embed" in params:                          # learned
        sd["pos_embed"] = _t(params["pos_embed"])
    else:                                              # fixed sin-cos constant
        sd["pos_embed"] = _t(get_2d_sincos_pos_embed(
            model.embed_dim, (gh, gw), cls_token=True)[None])

    pe = params["patch_embed"]
    if "conv0" in pe:                                  # ConvStem
        n_stem = len([k for k in pe if k.startswith("conv")])
        for i in range(n_stem):
            ti = 3 * i                                  # [Conv, BN, ReLU] triples
            sd[f"patch_embed.proj.{ti}.weight"] = _conv(pe[f"conv{i}"]["kernel"])
            bn_stats = (batch_stats or {}).get("patch_embed", {}).get(f"bn{i}", {})
            _put_bn(sd, f"patch_embed.proj.{ti + 1}",
                    pe[f"bn{i}"]["scale"], pe[f"bn{i}"]["bias"],
                    bn_stats.get("mean", np.zeros_like(pe[f"bn{i}"]["scale"])),
                    bn_stats.get("var", np.ones_like(pe[f"bn{i}"]["scale"])))
        final = 3 * n_stem
        sd[f"patch_embed.proj.{final}.weight"] = _conv(pe["proj"]["kernel"])
        sd[f"patch_embed.proj.{final}.bias"] = _t(pe["proj"]["bias"])
    else:
        sd["patch_embed.proj.weight"] = _conv(pe["proj"]["kernel"])
        sd["patch_embed.proj.bias"] = _t(pe["proj"]["bias"])

    def block(flax_name: str, torch_prefix: str):
        b = params[flax_name]
        sd[f"{torch_prefix}.norm1.weight"] = _t(b["norm1"]["scale"])
        sd[f"{torch_prefix}.norm1.bias"] = _t(b["norm1"]["bias"])
        sd[f"{torch_prefix}.attn.qkv.weight"] = _linear(b["attn"]["qkv_kernel"])
        sd[f"{torch_prefix}.attn.q_bias"] = _t(b["attn"]["q_bias"])
        sd[f"{torch_prefix}.attn.v_bias"] = _t(b["attn"]["v_bias"])
        sd[f"{torch_prefix}.attn.proj.weight"] = _linear(b["attn"]["proj"]["kernel"])
        sd[f"{torch_prefix}.attn.proj.bias"] = _t(b["attn"]["proj"]["bias"])
        sd[f"{torch_prefix}.norm2.weight"] = _t(b["norm2"]["scale"])
        sd[f"{torch_prefix}.norm2.bias"] = _t(b["norm2"]["bias"])
        sd[f"{torch_prefix}.mlp.fc1.weight"] = _linear(b["mlp"]["fc1"]["kernel"])
        sd[f"{torch_prefix}.mlp.fc1.bias"] = _t(b["mlp"]["fc1"]["bias"])
        sd[f"{torch_prefix}.mlp.fc2.weight"] = _linear(b["mlp"]["fc2"]["kernel"])
        sd[f"{torch_prefix}.mlp.fc2.bias"] = _t(b["mlp"]["fc2"]["bias"])

    n_blocks = len([k for k in params if k.startswith("block")])
    for i in range(n_blocks):
        block(f"block{i}", f"blocks.{i}")
    sd["norm.weight"] = _t(params["norm"]["scale"])
    sd["norm.bias"] = _t(params["norm"]["bias"])

    if "decoder_embed" in params:
        sd["decoder_embed.weight"] = _linear(params["decoder_embed"]["kernel"])
        sd["decoder_embed.bias"] = _t(params["decoder_embed"]["bias"])
        sd["mask_token"] = _t(params["mask_token"])
        dec_dim = int(np.asarray(params["decoder_embed"]["kernel"]).shape[1])
        sd["decoder_pos_embed"] = _t(get_2d_sincos_pos_embed(
            dec_dim, (gh, gw), cls_token=True)[None])
        n_dec = len([k for k in params if k.startswith("decoder_block")])
        for i in range(n_dec):
            block(f"decoder_block{i}", f"decoder_blocks.{i}")
        sd["decoder_norm.weight"] = _t(params["decoder_norm"]["scale"])
        sd["decoder_norm.bias"] = _t(params["decoder_norm"]["bias"])
        sd["decoder_pred.weight"] = _linear(params["decoder_pred"]["kernel"])
        sd["decoder_pred.bias"] = _t(params["decoder_pred"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# AudioNTT
# ---------------------------------------------------------------------------

def export_audiontt_state_dict(variables, squeeze_excitation: bool = False):
    """variables: {"params": {"encoder": ...}, "batch_stats": {"encoder": ...}}
    (the AudioNTT2022 inner-encoder subtrees, as torch_import consumes)."""
    p = variables["params"]["encoder"]
    s = variables["batch_stats"]["encoder"]
    sd: Dict = {}
    block_len = 5 if squeeze_excitation else 4
    for layer in range(2):
        base = layer * block_len
        sd[f"features.{base}.weight"] = _conv(p[f"Conv_{layer}"]["kernel"])
        sd[f"features.{base}.bias"] = _t(p[f"Conv_{layer}"]["bias"])
        _put_bn(sd, f"features.{base + 1}",
                p[f"BatchNorm_{layer}"]["scale"], p[f"BatchNorm_{layer}"]["bias"],
                s[f"BatchNorm_{layer}"]["mean"], s[f"BatchNorm_{layer}"]["var"])
        if squeeze_excitation:
            se = base + 4
            sd[f"features.{se}.excitation.0.weight"] = _linear(
                p[f"SEBlock_{layer}"]["Dense_0"]["kernel"])
            sd[f"features.{se}.excitation.2.weight"] = _linear(
                p[f"SEBlock_{layer}"]["Dense_1"]["kernel"])
    sd["fc.0.weight"] = _linear(p["Dense_0"]["kernel"])
    sd["fc.0.bias"] = _t(p["Dense_0"]["bias"])
    sd["fc.3.weight"] = _linear(p["Dense_1"]["kernel"])
    sd["fc.3.bias"] = _t(p["Dense_1"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------

def export_resnet_state_dict(variables, model_type: str):
    """Reference factories use the deep C stem (conv1 Sequential indices
    0/3/6) and plain downsample (conv at .0, BN at .1 — D=False,
    models/resnet.py:245-249) for all four exported variants."""
    p = variables["params"]
    s = variables["batch_stats"]
    sd: Dict = {}
    for i, ti in enumerate((0, 3, 6), start=1):
        sd[f"conv1.{ti}.weight"] = _conv(p[f"stem{i}"]["kernel"])
        _put_bn(sd, f"conv1.{ti + 1}",
                p[f"stem_bn{i}"]["scale"], p[f"stem_bn{i}"]["bias"],
                s[f"stem_bn{i}"]["mean"], s[f"stem_bn{i}"]["var"])
    bottleneck = "resnet50" in model_type
    n_convs = 3 if bottleneck else 2
    from ssl_audio_tpu.utils.torch_import import _RESNET_LAYERS

    layers = _RESNET_LAYERS["resnet50" if bottleneck else "resnet18"]
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            fx = f"layer{stage}_{b}"
            tp = f"layer{stage}.{b}"
            for c in range(1, n_convs + 1):
                sd[f"{tp}.conv{c}.weight"] = _conv(p[fx][f"conv{c}"]["kernel"])
                _put_bn(sd, f"{tp}.bn{c}",
                        p[fx][f"bn{c}"]["scale"], p[fx][f"bn{c}"]["bias"],
                        s[fx][f"bn{c}"]["mean"], s[fx][f"bn{c}"]["var"])
            if "down_conv" in p[fx]:
                sd[f"{tp}.downsample.0.weight"] = _conv(p[fx]["down_conv"]["kernel"])
                _put_bn(sd, f"{tp}.downsample.1",
                        p[fx]["down_bn"]["scale"], p[fx]["down_bn"]["bias"],
                        s[fx]["down_bn"]["mean"], s[fx]["down_bn"]["var"])
    return sd


def export_conv_state_dict(variables, model_type: str):
    if model_type == "audiontt":
        return export_audiontt_state_dict(variables)
    return export_resnet_state_dict(variables, model_type)
