"""Import reference PyTorch checkpoints (.pth) into Flax param trees.

Supports the three encoder families (SURVEY.md §7 'checkpoint interop'):
  * MAE-ViT tiny/small/base, plain and conv-stem (reference models/mae.py)
  * AudioNTT2022 (model.py:130-183), with or without SE blocks
  * ResNet-18/50 incl. ReGP_NRF variants (models/resnet.py)

Handles the reference's nested-prefix checkpoints by stripping
"backbone.encoder."/"encoder.encoder."/"encoder." the same way its own
consumers do (linear.py:114-133, hear/sample/*.py).

Conventions: torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O); Linear
(O, I) -> (I, O); BatchNorm weight/bias -> scale/bias + running stats ->
batch_stats.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    for prefix in ("backbone.encoder.encoder.", "backbone.encoder.",
                   "encoder.encoder.", "encoder."):
        clean = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        if clean:
            sd = clean
            break
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class _TreeWriter:
    """Writes values into a nested-dict param tree with shape checking."""

    def __init__(self, tree):
        import jax

        self.tree = jax.tree.map(np.asarray, tree)
        self.written = []

    def put(self, path: Tuple[str, ...], value: np.ndarray):
        node = self.tree
        for k in path[:-1]:
            node = node[k]
        old = node[path[-1]]
        if tuple(old.shape) != tuple(value.shape):
            raise ValueError(f"{'/'.join(path)}: shape {old.shape} != {value.shape}")
        node[path[-1]] = value.astype(old.dtype)
        self.written.append("/".join(path))


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------

def interpolate_pos_embed(pos_embed: np.ndarray, target_len: int,
                          num_extra_tokens: int = 1,
                          ckpt_grid=None, target_grid=None) -> np.ndarray:
    """Bicubic-resize a checkpoint's learned pos-embed to a new patch grid
    (reference models/pos_embed.py:71-92): extra (cls) tokens kept unchanged,
    position tokens reshaped to the source grid and bicubic-interpolated
    (align_corners=False) to the target grid.

    The reference infers square grids from token counts; audio ViT grids are
    usually rectangular, so pass ckpt_grid/target_grid explicitly for those.
    Runs through torch's interpolate — this is a host-side, import-time
    conversion, and torch's bicubic is the exact reference kernel."""
    import torch
    import torch.nn.functional as F

    if pos_embed.shape[1] == target_len:
        return pos_embed

    def _grid(n, given, what):
        if given is not None:
            gh, gw = given
            assert gh * gw == n, f"{what} grid {given} != {n} tokens"
            return int(gh), int(gw)
        s = int(round(n ** 0.5))
        assert s * s == n, (
            f"{what}: {n} position tokens is not square; pass {what}_grid"
        )
        return s, s

    d = pos_embed.shape[-1]
    oh, ow = _grid(pos_embed.shape[1] - num_extra_tokens, ckpt_grid, "ckpt")
    nh, nw = _grid(target_len - num_extra_tokens, target_grid, "target")
    extra = pos_embed[:, :num_extra_tokens]
    tokens = torch.from_numpy(
        np.ascontiguousarray(pos_embed[:, num_extra_tokens:], dtype=np.float32)
    ).reshape(1, oh, ow, d).permute(0, 3, 1, 2)
    tokens = F.interpolate(tokens, size=(nh, nw), mode="bicubic",
                           align_corners=False)
    tokens = tokens.permute(0, 2, 3, 1).reshape(1, nh * nw, d).numpy()
    return np.concatenate([extra.astype(np.float32), tokens], axis=1)


def load_torch_vit_params(path: str, params_template, batch_stats_template=None,
                          ckpt_grid=None, target_grid=None):
    """Returns flax params (and batch_stats when a conv-stem template is
    given) populated from a reference MAE-ViT state dict.  A learned
    pos-embed whose grid differs from the template's is bicubic-resized on
    import, as the reference does via interpolate_pos_embed
    (models/pos_embed.py:71-92)."""
    sd = _load_state_dict(path)
    w = _TreeWriter(params_template)
    bs = _TreeWriter(batch_stats_template) if batch_stats_template else None

    w.put(("cls_token",), sd["cls_token"])
    if "pos_embed" in w.tree:
        pe = sd["pos_embed"]
        tgt_len = w.tree["pos_embed"].shape[1]
        if pe.shape[1] != tgt_len:
            pe = interpolate_pos_embed(pe, tgt_len, ckpt_grid=ckpt_grid,
                                       target_grid=target_grid)
        w.put(("pos_embed",), pe)

    if "patch_embed.proj.weight" in sd and sd["patch_embed.proj.weight"].ndim == 4:
        # plain PatchEmbed
        w.put(("patch_embed", "proj", "kernel"), _conv(sd["patch_embed.proj.weight"]))
        w.put(("patch_embed", "proj", "bias"), sd["patch_embed.proj.bias"])
    else:
        # ConvStem: Sequential [Conv,BN,ReLU]*L + final 1x1 Conv
        conv_idx = sorted(
            int(k.split(".")[2]) for k in sd
            if k.startswith("patch_embed.proj.") and k.endswith(".weight")
            and sd[k].ndim == 4
        )
        stem_convs, final_conv = conv_idx[:-1], conv_idx[-1]
        for i, ti in enumerate(stem_convs):
            w.put(("patch_embed", f"conv{i}", "kernel"),
                  _conv(sd[f"patch_embed.proj.{ti}.weight"]))
            w.put(("patch_embed", f"bn{i}", "scale"),
                  sd[f"patch_embed.proj.{ti + 1}.weight"])
            w.put(("patch_embed", f"bn{i}", "bias"),
                  sd[f"patch_embed.proj.{ti + 1}.bias"])
            if bs is not None:
                bs.put(("patch_embed", f"bn{i}", "mean"),
                       sd[f"patch_embed.proj.{ti + 1}.running_mean"])
                bs.put(("patch_embed", f"bn{i}", "var"),
                       sd[f"patch_embed.proj.{ti + 1}.running_var"])
        w.put(("patch_embed", "proj", "kernel"),
              _conv(sd[f"patch_embed.proj.{final_conv}.weight"]))
        w.put(("patch_embed", "proj", "bias"),
              sd[f"patch_embed.proj.{final_conv}.bias"])

    def block(flax_name: str, torch_prefix: str):
        w.put((flax_name, "norm1", "scale"), sd[f"{torch_prefix}.norm1.weight"])
        w.put((flax_name, "norm1", "bias"), sd[f"{torch_prefix}.norm1.bias"])
        w.put((flax_name, "attn", "qkv_kernel"), _linear(sd[f"{torch_prefix}.attn.qkv.weight"]))
        w.put((flax_name, "attn", "q_bias"), sd[f"{torch_prefix}.attn.q_bias"])
        w.put((flax_name, "attn", "v_bias"), sd[f"{torch_prefix}.attn.v_bias"])
        w.put((flax_name, "attn", "proj", "kernel"), _linear(sd[f"{torch_prefix}.attn.proj.weight"]))
        w.put((flax_name, "attn", "proj", "bias"), sd[f"{torch_prefix}.attn.proj.bias"])
        w.put((flax_name, "norm2", "scale"), sd[f"{torch_prefix}.norm2.weight"])
        w.put((flax_name, "norm2", "bias"), sd[f"{torch_prefix}.norm2.bias"])
        w.put((flax_name, "mlp", "fc1", "kernel"), _linear(sd[f"{torch_prefix}.mlp.fc1.weight"]))
        w.put((flax_name, "mlp", "fc1", "bias"), sd[f"{torch_prefix}.mlp.fc1.bias"])
        w.put((flax_name, "mlp", "fc2", "kernel"), _linear(sd[f"{torch_prefix}.mlp.fc2.weight"]))
        w.put((flax_name, "mlp", "fc2", "bias"), sd[f"{torch_prefix}.mlp.fc2.bias"])

    n_blocks = len([k for k in w.tree if k.startswith("block")])
    for i in range(n_blocks):
        block(f"block{i}", f"blocks.{i}")
    w.put(("norm", "scale"), sd["norm.weight"])
    w.put(("norm", "bias"), sd["norm.bias"])

    if "decoder_embed" in w.tree:
        w.put(("decoder_embed", "kernel"), _linear(sd["decoder_embed.weight"]))
        w.put(("decoder_embed", "bias"), sd["decoder_embed.bias"])
        w.put(("mask_token",), sd["mask_token"])
        n_dec = len([k for k in w.tree if k.startswith("decoder_block")])
        for i in range(n_dec):
            block(f"decoder_block{i}", f"decoder_blocks.{i}")
        w.put(("decoder_norm", "scale"), sd["decoder_norm.weight"])
        w.put(("decoder_norm", "bias"), sd["decoder_norm.bias"])
        w.put(("decoder_pred", "kernel"), _linear(sd["decoder_pred.weight"]))
        w.put(("decoder_pred", "bias"), sd["decoder_pred.bias"])

    if bs is not None:
        return w.tree, bs.tree
    return w.tree


# ---------------------------------------------------------------------------
# AudioNTT
# ---------------------------------------------------------------------------

def load_torch_audiontt_variables(path: str, variables, squeeze_excitation=False):
    """AudioNTT2022: torch Sequential features + fc -> flax auto-named tree."""
    sd = _load_state_dict(path)
    params = _TreeWriter(variables["params"]["encoder"])
    stats = _TreeWriter(variables["batch_stats"]["encoder"])

    block_len = 5 if squeeze_excitation else 4                # +SE module
    for layer in range(2):
        base = layer * block_len
        params.put((f"Conv_{layer}", "kernel"), _conv(sd[f"features.{base}.weight"]))
        params.put((f"Conv_{layer}", "bias"), sd[f"features.{base}.bias"])
        params.put((f"BatchNorm_{layer}", "scale"), sd[f"features.{base + 1}.weight"])
        params.put((f"BatchNorm_{layer}", "bias"), sd[f"features.{base + 1}.bias"])
        stats.put((f"BatchNorm_{layer}", "mean"), sd[f"features.{base + 1}.running_mean"])
        stats.put((f"BatchNorm_{layer}", "var"), sd[f"features.{base + 1}.running_var"])
        if squeeze_excitation:
            se = base + 4
            params.put((f"SEBlock_{layer}", "Dense_0", "kernel"),
                       _linear(sd[f"features.{se}.excitation.0.weight"]))
            params.put((f"SEBlock_{layer}", "Dense_1", "kernel"),
                       _linear(sd[f"features.{se}.excitation.2.weight"]))
    params.put(("Dense_0", "kernel"), _linear(sd["fc.0.weight"]))
    params.put(("Dense_0", "bias"), sd["fc.0.bias"])
    params.put(("Dense_1", "kernel"), _linear(sd["fc.3.weight"]))
    params.put(("Dense_1", "bias"), sd["fc.3.bias"])

    return {"params": {"encoder": params.tree},
            "batch_stats": {"encoder": stats.tree}}


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------

_RESNET_LAYERS = {"resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
                  "resnet50": [3, 4, 6, 3]}


def load_torch_resnet_variables(path: str, variables, model_type: str):
    sd = _load_state_dict(path)
    params = _TreeWriter(variables["params"])
    stats = _TreeWriter(variables["batch_stats"])
    bottleneck = "resnet50" in model_type
    layers = _RESNET_LAYERS["resnet50" if bottleneck else "resnet18"]

    def put_bn(flax_path, torch_prefix):
        params.put(flax_path + ("scale",), sd[f"{torch_prefix}.weight"])
        params.put(flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
        stats.put(flax_path + ("mean",), sd[f"{torch_prefix}.running_mean"])
        stats.put(flax_path + ("var",), sd[f"{torch_prefix}.running_var"])

    # deep stem (C=True): torch conv1 Sequential indices 0,1,3,4,6,7
    for i, ti in enumerate((0, 3, 6), start=1):
        params.put((f"stem{i}", "kernel"), _conv(sd[f"conv1.{ti}.weight"]))
        put_bn((f"stem_bn{i}",), f"conv1.{ti + 1}")

    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            fx = f"layer{stage}_{b}"
            tp = f"layer{stage}.{b}"
            for c in range(1, n_convs + 1):
                params.put((fx, f"conv{c}", "kernel"), _conv(sd[f"{tp}.conv{c}.weight"]))
                put_bn((fx, f"bn{c}"), f"{tp}.bn{c}")
            if f"{tp}.downsample.0.weight" in sd:
                params.put((fx, "down_conv", "kernel"), _conv(sd[f"{tp}.downsample.0.weight"]))
                put_bn((fx, "down_bn"), f"{tp}.downsample.1")
            elif f"{tp}.downsample.1.weight" in sd and sd[f"{tp}.downsample.1.weight"].ndim == 4:
                # ResNet-D: AvgPool at 0, conv at 1, BN at 2
                params.put((fx, "down_conv", "kernel"), _conv(sd[f"{tp}.downsample.1.weight"]))
                put_bn((fx, "down_bn"), f"{tp}.downsample.2")

    return {"params": params.tree, "batch_stats": stats.tree}


def load_torch_conv_variables(path: str, variables, model_type: str):
    if model_type == "audiontt":
        return load_torch_audiontt_variables(path, variables)
    return load_torch_resnet_variables(path, variables, model_type)
