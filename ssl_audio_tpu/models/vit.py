"""Masked-Autoencoder ViT encoder/decoder (reference models/mae.py).

TPU-first masking design: the reference gathers the visible-token subset
(random_masking, mae.py:309-347), which makes the sequence length depend on
mask_ratio — a dynamic shape XLA can't compile once.  Here all L tokens stay
in the sequence and masked tokens are excluded *as attention keys* via an
additive bias at every block.  This is mathematically identical for every
consumer of the encoder output (CLS token / kept tokens / decoder input —
LayerNorm and the MLP are per-token, and masked tokens never contribute to any
attention result), while keeping one static shape for any mask_ratio,
including the traced per-step ratios of --random_mask_ratio and
--mask_ratio_schedule (reference main.py:72-81).

Masked-token encoder outputs are garbage by construction; the decoder replaces
them with the mask token (same positions the reference fills after
unshuffling, mae.py:411-419), and the Barlow-Twins path only reads CLS.

Model grid for audio: img (64, 96), patch (16, 16) -> 4 x 6 = 24 patches.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssl_audio_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_sharded,
)
from ssl_audio_tpu.ops.fused_attention import supports as fused_attention_supports
from ssl_audio_tpu.ops.pos_embed import get_2d_sincos_pos_embed, get_sinusoid_encoding_table

NEG_INF = -1e9

xavier_uniform = nn.initializers.xavier_uniform()
normal02 = nn.initializers.normal(stddev=0.02)


def _to_2tuple(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


class PatchEmbed(nn.Module):
    """Conv patchifier: (B, 1, F, T) -> (B, L, D), row-major (freq outer)."""

    patch_size: Tuple[int, int]
    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.transpose(x, (0, 2, 3, 1))                    # NHWC
        h = nn.Conv(
            self.embed_dim,
            self.patch_size,
            strides=self.patch_size,
            padding="VALID",
            kernel_init=xavier_uniform,
            name="proj",
        )(h)
        B, gH, gW, D = h.shape
        return h.reshape(B, gH * gW, D)


class ConvStem(nn.Module):
    """Early-convolution stem (reference mae.py:46-99): 3x3 stride-2 conv
    stack doubling channels, final 1x1 projection.  Stride plans per patch
    size follow mae.py:58-67."""

    patch_size: Tuple[int, int]
    embed_dim: int

    @staticmethod
    def strides_for(patch_size: Tuple[int, int]) -> Sequence[Tuple[int, int]]:
        ps = tuple(patch_size)
        plans = {
            (16, 16): [2, 2, 2, 2],
            (16, 8): [2, 2, 2, (2, 1)],
            (8, 8): [2, 2, 2, 1],
            (64, 2): [2, (2, 1), (2, 1), (2, 1), (2, 1), (2, 1)],
        }
        if ps not in plans:
            raise ValueError(f"Patch size {ps} is not supported by ConvStem")
        return [(s, s) if isinstance(s, int) else s for s in plans[ps]]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        assert self.embed_dim % 8 == 0
        strides = self.strides_for(self.patch_size)
        h = jnp.transpose(x, (0, 2, 3, 1))
        dim = self.embed_dim // 8
        for i, s in enumerate(strides):
            h = nn.Conv(dim, (3, 3), strides=s, padding=1, use_bias=False,
                        name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(h)
            h = nn.relu(h)
            if dim < self.embed_dim:
                dim *= 2
        h = nn.Conv(self.embed_dim, (1, 1), name="proj")(h)
        B, gH, gW, D = h.shape
        return h.reshape(B, gH * gW, D)


class AttentionKBiasZero(nn.Module):
    """Multi-head attention whose qkv projection has biases only for q and v
    (k bias pinned at zero — reference mae.py:102-141).  `key_bias` is an
    additive (B, 1, 1, N) logit bias used for token masking.

    With `fused=True` (opt-in; measured neutral on this chip — PERF.md
    "Fused attention (r4)") the qkv-unpack + QK^T + softmax + AV region
    runs as one Pallas kernel on the RAW (B, N, 3C) projection output
    (ops/fused_attention.py).  Identical math at bf16-MXU rounding; einsum
    fallback for return_attention and shapes outside the kernel
    envelope."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    fused: bool = False
    fused_mesh: Optional[object] = None
    # Materialize the attention-layout transposes as standalone copies
    # instead of letting XLA fold them into consumer GEMM operand reads:
    # the (B,H,N,hd)->(B,N,C) relayout folded into a (2688,768)x(768,*) GEMM
    # drops it from ~129 to ~72 TF/s, while a materialized copy + clean GEMM
    # runs at ~107 (tools/gemm_probe.py, gemm_probe_fold.json, 2026-08-20).
    layout_barrier: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_bias: Optional[jnp.ndarray] = None,
        return_attention: bool = False,
    ):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv_w = self.param("qkv_kernel", xavier_uniform, (C, 3 * C))
        qkv = x @ qkv_w
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
            qkv = qkv + jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        if (self.fused and not return_attention
                and fused_attention_supports(B, N, C, H)):
            bias2 = (jnp.zeros((B, N), jnp.float32) if key_bias is None
                     else key_bias[:, 0, 0, :].astype(jnp.float32))
            if self.fused_mesh is not None:
                out = fused_attention_sharded(qkv, bias2, H, self.fused_mesh)
            else:
                out = fused_attention(qkv, bias2, H)
        else:
            qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
            if self.layout_barrier:
                qkv = jax.lax.optimization_barrier(qkv)
            q, k, v = qkv[0], qkv[1], qkv[2]                  # (B, H, N, hd)
            # softmax in f32 regardless of activation dtype (torch AMP
            # semantics; the fused kernel does the same) — a no-op cast on
            # fp32 runs, and XLA folds it into the softmax loop fusion
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
            attn = attn * (hd ** -0.5)
            if key_bias is not None:
                attn = attn + key_bias
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
            if self.layout_barrier:
                out = jax.lax.optimization_barrier(out)
        out = nn.Dense(C, kernel_init=xavier_uniform, name="proj")(out)
        if return_attention:
            return out, attn
        return out


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, kernel_init=xavier_uniform, name="fc2")(x)


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    ln_eps: float = 1e-6
    fused_attention: bool = False
    fused_attn_mesh: Optional[object] = None
    layout_barrier: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_bias: Optional[jnp.ndarray] = None,
        train: bool = True,
        return_attention: bool = False,
    ):
        attn_mod = AttentionKBiasZero(
            self.dim, self.num_heads, name="attn",
            fused=self.fused_attention, fused_mesh=self.fused_attn_mesh,
            layout_barrier=self.layout_barrier)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        if return_attention:
            _, attn = attn_mod(h, key_bias, return_attention=True)
            return attn
        x_att = attn_mod(h, key_bias)
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(x_att, train=train)
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
        x = x + dp(Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h), train=train)
        return x


def random_token_mask(
    rng: jax.Array, batch: int, length: int, mask_ratio
) -> jnp.ndarray:
    """Per-sample random binary mask (1 = removed), reference random_masking
    semantics (mae.py:330-346): rank tokens by uniform noise, remove the
    highest L - floor(L*(1-r)) ranks.  mask_ratio may be a traced scalar."""
    len_keep = jnp.floor(length * (1.0 - mask_ratio)).astype(jnp.int32)
    noise = jax.random.uniform(rng, (batch, length))
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    return (ranks >= len_keep).astype(jnp.float32)


def _resize_bicubic_static(table: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Static-shape bicubic resize of a (H, W, D) grid (align_corners=False),
    used for pos-embed interpolation (reference mae.py:367-392)."""
    return jax.image.resize(table, (out_hw[0], out_hw[1], table.shape[-1]), "bicubic")


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    img_size: Tuple[int, int] = (64, 96)
    patch_size: Tuple[int, int] = (16, 16)
    in_chans: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    conv_stem: bool = False
    use_decoder: bool = False
    use_learned_pos_embd: bool = False
    decoder_embed_dim: int = 384
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    use_2d_dec_pos_embd: bool = False
    drop_path_rate: float = 0.0
    # gradient checkpointing: rematerialize each block's activations in the
    # backward pass (jax.checkpoint) — trades ~33% more FLOPs for O(depth)
    # less activation HBM; the TPU lever for large-batch/long-sequence runs
    remat: bool = False
    # Pallas fused attention (ops/fused_attention.py): qkv-unpack + QK^T +
    # softmax + AV as one kernel on the raw qkv GEMM output — see
    # AttentionKBiasZero.  Applied to encoder AND decoder blocks; shapes
    # outside the kernel envelope fall back to the einsum path per-block.
    fused_attention: bool = False
    # Barrier attention-layout transposes out of consumer GEMMs (see
    # AttentionKBiasZero.layout_barrier).
    layout_barrier: bool = False


class MaskedAutoencoderViT(nn.Module):
    spec: ViTSpec
    # static mesh handle for the shard_map fused-attention form (like
    # AudioNTT2022.fused_mesh); None = single-device pallas_call
    fused_attn_mesh: Optional[object] = None

    @property
    def img_size(self) -> Tuple[int, int]:
        return self.spec.img_size

    @property
    def embed_dim(self) -> int:
        return self.spec.embed_dim

    def grid_size(self) -> Tuple[int, int]:
        return (
            self.spec.img_size[0] // self.spec.patch_size[0],
            self.spec.img_size[1] // self.spec.patch_size[1],
        )

    def patch_size(self) -> Tuple[int, int]:
        return tuple(self.spec.patch_size)

    def img_patch_dim(self) -> int:
        ph, pw = self.spec.patch_size
        return ph * pw * self.spec.in_chans

    # ---- patch <-> image -------------------------------------------------
    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """(N, C, F, T) -> (N, L, ph*pw*C); einsum order matches reference
        'nchpwq->nhwpqc' (mae.py:282-293)."""
        ph, pw = self.spec.patch_size
        N, C, F, T = imgs.shape
        h, w = F // ph, T // pw
        x = imgs.reshape(N, C, h, ph, w, pw)
        x = jnp.einsum("nchpwq->nhwpqc", x)
        return x.reshape(N, h * w, ph * pw * C)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        ph, pw = self.spec.patch_size
        h, w = self.grid_size()
        N = x.shape[0]
        x = x.reshape(N, h, w, ph, pw, self.spec.in_chans)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(N, self.spec.in_chans, h * ph, w * pw)

    # ---- setup -----------------------------------------------------------
    def setup(self):
        s = self.spec
        gh, gw = self.grid_size()
        L = gh * gw
        if s.conv_stem:
            self.patch_embed = ConvStem(tuple(s.patch_size), s.embed_dim, name="patch_embed")
        else:
            # random patch projection, frozen (mae.py:190-192) — the optimizer
            # masks 'patch_embed' params out of updates (train/optim.py)
            self.patch_embed = PatchEmbed(tuple(s.patch_size), s.embed_dim, name="patch_embed")
        self.cls_token = self.param("cls_token", normal02, (1, 1, s.embed_dim))
        if s.use_learned_pos_embd:
            self.pos_embed = self.param("pos_embed", normal02, (1, L + 1, s.embed_dim))
        else:
            table = get_2d_sincos_pos_embed(s.embed_dim, (gh, gw), cls_token=True)
            self.pos_embed = jnp.asarray(table[None])          # constant
        # static_argnums are positions in Block.__call__ AFTER self:
        # (x, key_bias, train, return_attention) -> train/return_attention
        block_cls = nn.remat(Block, static_argnums=(2, 3)) if s.remat else Block
        self.blocks = [
            block_cls(
                s.embed_dim,
                s.num_heads,
                s.mlp_ratio,
                drop_path=float(np.linspace(0, s.drop_path_rate, s.depth)[i]),
                fused_attention=s.fused_attention,
                fused_attn_mesh=self.fused_attn_mesh,
                layout_barrier=s.layout_barrier,
                name=f"block{i}",
            )
            for i in range(s.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")

        if s.use_decoder:
            self.decoder_embed = nn.Dense(s.decoder_embed_dim, kernel_init=xavier_uniform,
                                          name="decoder_embed")
            self.mask_token = self.param("mask_token", normal02, (1, 1, s.decoder_embed_dim))
            if s.use_2d_dec_pos_embd:
                dtab = get_2d_sincos_pos_embed(s.decoder_embed_dim, (gh, gw), cls_token=True)
            else:
                dtab = get_sinusoid_encoding_table(L, s.decoder_embed_dim, cls_token=True)
            self.decoder_pos_embed = jnp.asarray(dtab[None])
            self.decoder_blocks = [
                Block(s.decoder_embed_dim, s.decoder_num_heads, s.mlp_ratio,
                      fused_attention=s.fused_attention,
                      fused_attn_mesh=self.fused_attn_mesh,
                      layout_barrier=s.layout_barrier,
                      name=f"decoder_block{i}")
                for i in range(s.decoder_depth)
            ]
            self.decoder_norm = nn.LayerNorm(epsilon=1e-6, name="decoder_norm")
            self.decoder_pred = nn.Dense(self.img_patch_dim(), kernel_init=xavier_uniform,
                                         name="decoder_pred")

    # ---- pos embed for arbitrary input sizes -----------------------------
    def _pos_embed_for(self, F: int, T: int) -> jnp.ndarray:
        gh, gw = self.grid_size()
        h0 = F // self.spec.patch_size[0]
        w0 = T // self.spec.patch_size[1]
        if (h0, w0) == (gh, gw):
            return self.pos_embed
        cls_pe = self.pos_embed[:, :1]
        patch_pe = self.pos_embed[0, 1:].reshape(gh, gw, -1)
        patch_pe = _resize_bicubic_static(patch_pe, (h0, w0)).reshape(1, h0 * w0, -1)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)

    # ---- forward ---------------------------------------------------------
    def prepare_tokens(self, x: jnp.ndarray, mask_ratio, mask: Optional[jnp.ndarray],
                       train: bool = True, len_keep: Optional[int] = None):
        """Returns (tokens_with_cls, mask, key_bias, ids_keep).

        Two equivalent maskings of the same per-sample random token set
        (reference random_masking, mae.py:330-346):
        - key-bias (default): all L tokens kept, masked keys get a -inf
          attention bias.  Works with a TRACED mask_ratio (schedules).
        - token-drop (`len_keep` static int, = int(L*(1-mask_ratio)) exactly
          as the reference computes it): masked tokens are gathered OUT, so
          the blocks run on 1+len_keep tokens — the reference's own compute
          shape.  Kept-token outputs are identical to the key-bias path under
          the same 'mask' rng stream (attention over visible keys only is the
          same computation); this is the fast path for the teacher forward.
        """
        B, C, F, T = x.shape
        if self.spec.conv_stem:
            tokens = self.patch_embed(x, train=train)
        else:
            tokens = self.patch_embed(x)
        L = tokens.shape[1]
        # pos-embed tables are fp32 module constants; cast to the activation
        # dtype so a bf16 forward (--use_fp16 / compute_dtype="bfloat16")
        # stays bf16 — the bare add silently promoted every downstream
        # activation to fp32 (2x block bandwidth + a convert before every
        # MXU dot; PERF.md "ViT bf16 activations (r4)")
        pe = self._pos_embed_for(F, T)
        tokens = tokens + pe[:, 1:, :].astype(tokens.dtype)

        ids_keep = None
        if mask is None and len_keep is not None and 0 <= len_keep < L:
            noise = jax.random.uniform(self.make_rng("mask"), (B, L))
            ids_shuffle = jnp.argsort(noise, axis=1)
            ranks = jnp.argsort(ids_shuffle, axis=1)
            mask = (ranks >= len_keep).astype(jnp.float32)
            ids_keep = ids_shuffle[:, :len_keep]
            tokens = jnp.take_along_axis(tokens, ids_keep[..., None], axis=1)
            key_bias = None
        else:
            if mask is None:
                is_scalar_zero = isinstance(mask_ratio, (int, float)) and mask_ratio == 0
                if is_scalar_zero:
                    mask = jnp.zeros((B, L))
                else:
                    mask = random_token_mask(self.make_rng("mask"), B, L, mask_ratio)
            key_bias = (mask * NEG_INF)[:, None, None, :]      # (B,1,1,L)
            key_bias = jnp.pad(key_bias, ((0, 0), (0, 0), (0, 0), (1, 0)))  # cls visible

        cls = (self.cls_token + pe[:, :1, :]).astype(tokens.dtype)
        tokens = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), tokens], axis=1)
        return tokens, mask, key_bias, ids_keep

    def forward_encoder(self, x, mask_ratio, mask, train, len_keep=None):
        tokens, out_mask, key_bias, ids_keep = self.prepare_tokens(
            x, mask_ratio, mask, train, len_keep)
        for blk in self.blocks:
            tokens = blk(tokens, key_bias, train)
        tokens = self.norm(tokens)
        return tokens, out_mask, ids_keep

    def forward_decoder(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """tokens: (B, 1+L, D) encoder output; mask: (B, L) 1=removed.
        Equivalent to reference forward_decoder (mae.py:411-435): visible
        positions carry their encoding, masked positions the mask token."""
        d = self.decoder_embed(tokens)
        cls, patches = d[:, :1], d[:, 1:]
        # mask and pos-embed are fp32; cast so a bf16 forward stays bf16
        m = mask[..., None].astype(d.dtype)
        patches = (1.0 - m) * patches + m * self.mask_token.astype(d.dtype)
        x = jnp.concatenate([cls, patches], axis=1) \
            + self.decoder_pos_embed.astype(d.dtype)
        for blk in self.decoder_blocks:
            x = blk(x, None, False)
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        return x[:, 1:]

    def forward_loss(self, imgs, pred, mask):
        """Masked-patch MSE (mae.py:437-453).  Computed in f32: on a bf16
        forward the per-patch mean/var and the (pred-target)^2 reduction
        would otherwise accumulate at 8 mantissa bits (torch AMP also runs
        MSE reductions in f32)."""
        pred = pred.astype(jnp.float32)
        target = self.patchify(imgs).astype(jnp.float32)
        if self.spec.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / (var + 1e-6) ** 0.5
        loss = ((pred - target) ** 2).mean(axis=-1)            # (B, L)
        return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    def __call__(
        self,
        imgs: jnp.ndarray,
        mask_ratio=0,
        mean_pool: bool = False,
        return_all: bool = False,
        masked_recon: bool = False,
        mask: Optional[jnp.ndarray] = None,
        train: bool = True,
        len_keep: Optional[int] = None,
    ):
        tokens, out_mask, ids_keep = self.forward_encoder(
            imgs, mask_ratio, mask, train, len_keep)
        if return_all:
            latent = tokens
        elif mean_pool:
            if ids_keep is not None:
                # token-drop path: every non-cls token is visible by
                # construction — plain mean, exactly the reference's
                # x[:, 1:].mean(dim=1) over present tokens
                latent = tokens[:, 1:].mean(axis=1)
            else:
                # NOTE: with masking active the reference mean-pools visible
                # tokens only (they are the only ones present); replicate by
                # weighting with (1 - mask)
                w = 1.0 - out_mask
                latent = (tokens[:, 1:] * w[..., None]).sum(1) / jnp.maximum(
                    w.sum(1, keepdims=True), 1.0
                )
        else:
            latent = tokens[:, 0]
        if masked_recon:
            if ids_keep is not None:
                # scatter kept encodings back to full length; masked slots
                # hold zeros but are replaced by the mask token in
                # forward_decoder, so their content never matters
                B, L = out_mask.shape
                full = jnp.zeros((B, L, tokens.shape[-1]), tokens.dtype)
                full = full.at[jnp.arange(B)[:, None], ids_keep].set(tokens[:, 1:])
                tokens = jnp.concatenate([tokens[:, :1], full], axis=1)
            pred = self.forward_decoder(tokens, out_mask)
            return latent, self.forward_loss(imgs, pred, out_mask)
        return latent

    def forward_viz(self, imgs: jnp.ndarray, mask_ratio=0.75, train: bool = False):
        """Reconstruction visualization (reference forward_viz,
        mae.py:471-480): returns (loss, recons, errormap, mask_grid) with
        visible patches copied from the input."""
        tokens, mask, _ = self.forward_encoder(imgs, mask_ratio, None, train)
        pred = self.forward_decoder(tokens, mask)
        loss = self.forward_loss(imgs, pred, mask)
        target = self.patchify(imgs)
        visible = (mask == 0.0)[..., None]
        pred_on_mask = jnp.where(visible, target, pred)
        recons = self.unpatchify(pred_on_mask)
        errormap = jnp.sqrt((recons - imgs) ** 2)
        return loss, recons, errormap, mask.reshape(mask.shape[0], *self.grid_size())

    def forward_attn(self, imgs: jnp.ndarray, mask_ratio=0, train: bool = False):
        """Stacked per-block attention maps (mae.py:482-489)."""
        tokens, _, key_bias, _ = self.prepare_tokens(imgs, mask_ratio, None, train)
        attns = []
        for blk in self.blocks:
            attns.append(blk(tokens, key_bias, train, True))
            tokens = blk(tokens, key_bias, train)
        return jnp.stack(attns, axis=0)

    def get_intermediate_layers(self, imgs: jnp.ndarray, mask_ratio=0, train: bool = False):
        tokens, _, key_bias, _ = self.prepare_tokens(imgs, mask_ratio, None, train)
        out = []
        for blk in self.blocks:
            tokens = blk(tokens, key_bias, train)
            out.append(self.norm(tokens))
        return out


_SIZES = {
    # (embed_dim, depth, num_heads); conv-stem variants use depth-1
    "base": (768, 12, 12),
    "small": (384, 12, 6),
    "tiny": (192, 12, 3),
}


def get_mae_vit(
    size: str = "base",
    patch_size=None,
    c: bool = False,
    img_size=(64, 96),
    in_chans: int = 1,
    use_decoder: bool = False,
    use_learned_pos_embd: bool = False,
    fused_attn_mesh=None,
    **kw,
) -> MaskedAutoencoderViT:
    """Factory matching reference get_mae_vit (mae.py:576-596)."""
    if patch_size is None:
        patch_size = [16, 16]
    if size not in _SIZES:
        raise NotImplementedError(f"Size {size} is not supported")
    embed_dim, depth, num_heads = _SIZES[size]
    if c:
        depth -= 1
    spec = ViTSpec(
        img_size=tuple(img_size),
        patch_size=tuple(patch_size),
        in_chans=in_chans,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        conv_stem=c,
        use_decoder=use_decoder,
        use_learned_pos_embd=use_learned_pos_embd,
        decoder_embed_dim=384,
        decoder_depth=4,
        decoder_num_heads=6,
        **kw,
    )
    return MaskedAutoencoderViT(spec, fused_attn_mesh=fused_attn_mesh)
