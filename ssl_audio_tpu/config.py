"""Configuration system.

Mirrors the reference flag surface (utils/hyperparameters.py:32-110) 1:1 so CLI
invocations port unchanged, but as a typed dataclass instead of a bare argparse
namespace.  `setup_model_defaults` reproduces the model-conditional defaults at
utils/hyperparameters.py:101-110 (ViT -> AdamW, conv -> LARS).
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

MODELS = [
    "resnet50", "resnet50_ReGP_NRF",
    "resnet18", "resnet18_ReGP_NRF",
    "audiontt",
    "vit_base", "vit_small", "vit_tiny",
    "vitc_base", "vitc_small", "vitc_tiny",
]

DATASETS = [
    "fsd50k",
    "audioset",
    "librispeech",
    "fsd50k+librispeech",
    "audioset+librispeech",
    "nsynth",         # NSynth-50h HEAR task (reference sweep dataset, sweep.py:369-402)
    "audioset_wav",   # wav-domain AudioSet (reference old/data_manager/audioset.py)
    "cifar10",
    "synthetic",      # extension: host-free random log-mels for smoke/bench runs
    "synthetic_wav",  # extension: raw waveforms for the on-device-frontend mode
    "synthetic_multicue",  # extension: augmentation-robust learning-proof task
]

OPTIMIZERS = ["Adam", "AdamW", "SGD", "LARS"]


@dataclass
class Config:
    # model / data selection
    model_type: str = "audiontt"
    dataset: str = "fsd50k"
    epochs: int = 100
    lr_schedule: bool = False
    epoch_save_f: int = 5
    epoch_eval_f: int = 5
    no_eval: bool = False
    batch_size: int = 128

    # Barlow Twins objective (reference utils/loss.py)
    lmbda: float = 0.005
    alpha: float = 1.0
    HSIC: bool = False

    # projector / predictor heads (reference model.py:11-53)
    projector_out_dim: int = 256
    projector_n_hidden_layers: int = 1
    projector_hidden_dim: int = 8192
    predictor: bool = False
    stop_gradient: bool = False

    # multi-crop (reference utils/transforms.py)
    local_crops_number: int = 0
    local_crops_size: List[int] = field(default_factory=lambda: [16, 16])

    # audio frontend (reference datasets.py:39-48)
    unit_sec: float = 0.95
    crop_frames: int = 96
    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 160
    n_mels: int = 64
    f_min: int = 60
    f_max: int = 7800

    num_workers: int = 20

    # augmentations (reference augmentations.py)
    mixup_ratio: float = 0.2
    virtual_crop_scale: List[float] = field(default_factory=lambda: [1.0, 1.5])
    mixup: bool = True
    RRC: bool = True
    RLF: bool = True
    Gnoise: bool = False
    pre_norm: bool = False
    post_norm: bool = False

    load_lms: bool = True
    distributed: bool = False
    use_fp16: bool = False          # on TPU this selects bfloat16 compute
    use_fp16_eval: bool = False
    name: str = ""
    squeeze_excitation: bool = False

    # ViT masking (reference models/mae.py:309-347, main.py:72-81)
    mask: bool = False
    mask_ratio: float = 0.0
    random_mask_ratio: bool = False
    mask_ratio_schedule: bool = False
    mask_beta: float = 0.3
    # gradient checkpointing of ViT blocks (jax.checkpoint): ~33% more FLOPs
    # in exchange for O(depth) less activation HBM — enables large-batch /
    # long-sequence configs a v5e's 16 GB couldn't otherwise hold
    remat: bool = False
    # N train steps per device dispatch (lax.scan): amortizes the fixed
    # per-dispatch host/runtime cost (~25-30 ms on this machine's remote
    # tunnel) N-fold.  1 = reference-style step-by-step dispatch.
    steps_per_dispatch: int = 1
    # Pallas fused Conv-BN-ReLU-MaxPool for AudioNTT's first conv layer
    # (ops/fused_conv.py): identical math, ~no HBM round-trips of the
    # (B, 64, 96, 64) activation (measured B=256: fp32 step 26.2 -> 18.1 ms,
    # bf16 wav step 19.8 -> 16.8 ms).  None = auto: on for TPU training —
    # single chip, or any 1-D 'data' mesh, where the kernel runs per-shard
    # inside shard_map with psum'd BN moments/grad partials (r4; the
    # reference's DDP + SyncBatchNorm semantics).  Off on CPU (slow
    # interpret mode) and on 2-D TP meshes (the conv isn't tensor-parallel).
    # --fused_conv / --no_fused_conv force it.
    fused_conv: bool | None = None
    # Monotone pool-reorder for the AudioNTT conv blocks the Pallas kernel
    # doesn't take (block 2): identical math — pool(relu(bn(y))) ==
    # relu(bn(sign_aware_pool(y))) — with the BN/ReLU epilogue and backward
    # on the 4x-smaller pooled tensor (models/audiontt.py).  None = auto:
    # on for TPU training (pure XLA ops, GSPMD-shardable), off on CPU so
    # test oracles keep the literal flax composition.
    pool_reorder: bool | None = None
    # Pallas fused multi-head attention for the ViT family
    # (ops/fused_attention.py): head-packed block-diagonal dots on the raw
    # qkv GEMM output.  Measured NEUTRAL-to-negative on the full ViT-B
    # B=128 train step (41.77 vs 41.27 ms same-day A/B, 2026-08-18) — XLA's
    # full-graph lowering already folds the attention formatting into the
    # surrounding GEMMs (adjudication in PERF.md "Fused attention (r4)").
    # None = auto: OFF.  --fused_attention opts in (single chip or a 1-D
    # 'data' mesh via shard_map; parity-tested in
    # tests/test_fused_attention.py).
    fused_attention: bool | None = None
    # Materialize attention-layout transposes (qkv unpack, attn-out
    # (B,H,N,hd)->(B,N,C)) as standalone copies instead of letting XLA fold
    # them into consumer GEMM operand reads: a fold-in drops the
    # (2688,768)x(768,*) encoder GEMMs from ~129 to ~72 TF/s while copy +
    # clean GEMM runs at ~107 (tools/gemm_probe.py, 2026-08-20).  None =
    # auto: measured per-device-kind default (see resolve in
    # models/wrapper.py).  --layout_barrier / --no_layout_barrier force it.
    layout_barrier: bool | None = None
    # Wav-domain training frontend DFT/mel matmul precision: True runs the
    # three GEMMs at lax.Precision.HIGH (bf16x3, ~2e-4 rel log-mel error —
    # the same mode the HEAR fast_mel path ships) instead of HIGHEST.
    # On CPU HIGH == HIGHEST == fp32, so tests and parity are unaffected.
    fast_mel: bool = False
    # ViT masked forwards drop tokens (the reference's own compute shape,
    # mae.py:330-346) instead of key-bias masking; identical outputs, less
    # compute.  Each distinct len_keep = int(L*(1-ratio)) compiles once
    # (bounded by L values); disable if recompiles hurt more than they save.
    token_drop: bool = True
    use_learned_pos_embd: bool = False
    use_cls: bool = True
    use_mean_pool: bool = False
    patch_size: List[int] = field(default_factory=lambda: [16, 16])
    masked_recon: bool = False

    save_base_dir: str = ""
    resume_path: Optional[str] = None

    # optimizer (filled by setup_model_defaults, hyperparameters.py:101-110)
    optimizer: Optional[str] = None
    lr: Optional[float] = None
    lr_weights: Optional[float] = None
    lr_biases: Optional[float] = None
    wd: Optional[float] = None

    # BYOL-variant (reference main_bt_byol.py:352)
    moving_average_decay: float = 0.99

    # --- old-gen (legacy) trainer recipe knobs ---
    # The reference's old-gen DINO/BYOL-A trainers carry their OWN optimizer
    # recipes, separate from the active tree's hyperparameters.py defaults:
    # DINO (old/methods/dino.py:125-155 + old/configs/pretrain/dino.yaml):
    # AdamW with per-iteration cosine lr (base_lr scaled batch/256, warmup)
    # AND cosine weight decay; BYOL-A (old/byola/pretrain.py:142 +
    # old/byola/config.yaml): plain Adam at a constant lr.  Defaults below
    # are the reference yaml values; setup_model_defaults(method=...) routes
    # them (explicit CLI/yaml values win).
    base_lr: Optional[float] = None            # dino.yaml optimizer.base_lr
    final_lr: float = 1.0e-6                   # dino.yaml optimizer.final_lr
    final_wd: Optional[float] = None           # optimizer.final_weight_decay
    warmup_epochs: int = 6                     # dino.yaml optimizer.warmup_epochs
    momentum_teacher: float = 0.996            # dino.yaml model.momentum_teacher
    warmup_teacher_temp: float = 0.04          # dino.yaml model.warmup_teacher_temp
    teacher_temp: float = 0.4                  # dino.yaml model.teacher_temp
    warmup_teacher_temp_epochs: int = 18       # dino.yaml model.warmup_teacher_temp_epochs
    # DINO head output dim (dino.yaml model.projection.out_dim; the head's
    # hidden/bottleneck dims are the DINOHead class defaults 2048/256, which
    # the reference trainer never overrides, old/methods/dino.py:76-77)
    dino_out_dim: int = 4096
    # BYOL-A projector/predictor dims (old/byola/config.yaml
    # model.projection.{proj_size,proj_dim} -> BYOL(projection_size,
    # projection_hidden_size), old/byola/pretrain.py:116-125)
    proj_size: int = 256
    proj_dim: int = 4096

    # --- TPU-native extensions (no reference equivalent) ---
    # number of devices along the data mesh axis; 0 = all local devices
    data_axis_size: int = 0
    # tensor-parallel degree: >1 selects a 2-D (data, model) mesh with
    # Megatron-style sharding of the transformer Dense kernels
    # (parallel/mesh.py TP_RULES); must divide the device count
    model_parallel: int = 1
    # ZeRO-3-style fully-sharded data parallelism: params + optimizer
    # moments shard over the 'data' axis (GSPMD all-gathers params at use,
    # reduce-scatters grads); composes with --model_parallel
    fsdp: bool = False
    # mixup memory-bank size (reference augmentations.py:96 n_memory=2048);
    # on-device ring buffer rows
    mixup_n_memory: int = 2048
    # seed for all RNG
    seed: int = 0
    # steps per epoch when the dataset is synthetic
    synthetic_steps_per_epoch: int = 100
    # synthetic dataset size used to scale schedules
    synthetic_len: int = 12800
    # write a jax.profiler trace of training steps 10-20 here (empty = off)
    profile_dir: str = ""
    # wav-domain AudioSet selection (reference old/configs data.audioset.*
    # + AudioSet(balanced_only/test), old/data_manager/audioset.py:41-110)
    audioset_balanced_only: bool = False
    audioset_200k_only: bool = False

    def __post_init__(self):
        if isinstance(self.local_crops_size, tuple):
            self.local_crops_size = list(self.local_crops_size)
        if isinstance(self.patch_size, tuple):
            self.patch_size = list(self.patch_size)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def setup_model_defaults(cfg: Config, method: Optional[str] = None) -> Config:
    """Reference utils/hyperparameters.py:101-110.

    With method='dino'/'byola', first injects the old-gen trainer recipe the
    reference hard-codes per method (AdamW + cosine lr/wd schedules,
    old/methods/dino.py:125-147; plain Adam, old/byola/pretrain.py:142) —
    explicit values win, and the method recipe wins over the model-type
    fill below (the reference's old-gen trainers ignore hyperparameters.py).
    """
    if method == "dino":
        cfg = cfg.replace(
            optimizer="AdamW",
            base_lr=cfg.base_lr if cfg.base_lr is not None else 5.0e-4,
            wd=cfg.wd if cfg.wd is not None else 0.04,
            final_wd=cfg.final_wd if cfg.final_wd is not None else 0.4,
        )
    elif method == "byola":
        cfg = cfg.replace(
            optimizer="Adam",
            base_lr=cfg.base_lr if cfg.base_lr is not None else 3.0e-4,
            wd=cfg.wd if cfg.wd is not None else 0.0,
        )
    if "vit" in cfg.model_type:
        opt = cfg.optimizer or "AdamW"
        lr = cfg.lr if cfg.lr is not None else 1e-4 * cfg.batch_size / 128
        wd = cfg.wd if cfg.wd is not None else 0.06
        return cfg.replace(optimizer=opt, lr=lr, wd=wd)
    opt = cfg.optimizer or "LARS"
    lr_w = cfg.lr_weights if cfg.lr_weights is not None else 0.4 * cfg.batch_size / 128
    lr_b = cfg.lr_biases if cfg.lr_biases is not None else 0.0048 * cfg.batch_size / 128
    wd = cfg.wd if cfg.wd is not None else 1e-5
    return cfg.replace(optimizer=opt, lr_weights=lr_w, lr_biases=lr_b, wd=wd)


def default_config(method: Optional[str] = None, **kw) -> Config:
    return setup_model_defaults(Config(**kw), method=method)


def config_fingerprint(cfg: Config):
    """(resolved-config dict, short sha256) — stamped into every perf/proof
    artifact (tools/prove_learning.py, tools/mfu.py) so an artifact recorded
    under a superseded recipe is detectable (VERDICT r4 #7: the stale DINO
    proof slipped through because artifacts carried no config identity)."""
    import hashlib
    import json as _json

    d = dataclasses.asdict(cfg)
    blob = _json.dumps(d, sort_keys=True, default=str)
    return d, hashlib.sha256(blob.encode()).hexdigest()[:16]


def _add_bool_pair(parser, name, default, negative=None):
    dest = name.lstrip("-").replace("-", "_")
    parser.add_argument(f"--{dest}", action="store_true", default=default)
    if negative:
        parser.add_argument(f"--{negative}", action="store_false", dest=dest)


def build_argparser() -> argparse.ArgumentParser:
    """Flag-for-flag equivalent of reference utils/hyperparameters.py:32-98."""
    p = argparse.ArgumentParser(description="ssl_audio_tpu", add_help=True)
    p.add_argument("--model_type", default="audiontt", type=str, choices=MODELS)
    p.add_argument("--dataset", default="fsd50k", type=str, choices=DATASETS)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--lr_schedule", action="store_true", default=False)
    p.add_argument("--epoch_save_f", default=5, type=int)
    p.add_argument("--epoch_eval_f", default=5, type=int)
    p.add_argument("--no_eval", action="store_true", default=False)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lmbda", type=float, default=0.005)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--projector_out_dim", default=256, type=int)
    p.add_argument("--projector_n_hidden_layers", default=1, type=int)
    p.add_argument("--projector_hidden_dim", default=8192, type=int)
    p.add_argument("--local_crops_number", type=int, default=0)
    p.add_argument("--local_crops_size", nargs="+", type=int, default=[16, 16])
    p.add_argument("--unit_sec", type=float, default=0.95)
    p.add_argument("--crop_frames", type=int, default=96)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--n_fft", type=int, default=1024)
    p.add_argument("--win_length", type=int, default=1024)
    p.add_argument("--hop_length", type=int, default=160)
    p.add_argument("--n_mels", type=int, default=64)
    p.add_argument("--f_min", type=int, default=60)
    p.add_argument("--f_max", type=int, default=7800)
    p.add_argument("--num_workers", type=int, default=20)
    p.add_argument("--mixup_ratio", type=float, default=0.2)
    p.add_argument("--virtual_crop_scale", nargs="+", type=float, default=[1, 1.5])
    p.add_argument("--HSIC", action="store_true", default=False)
    _add_bool_pair(p, "mixup", True, "no_mixup")
    _add_bool_pair(p, "RRC", True, "no_RRC")
    _add_bool_pair(p, "RLF", True, "no_RLF")
    p.add_argument("--Gnoise", action="store_true", default=False)
    p.add_argument("--pre_norm", action="store_true", default=False)
    p.add_argument("--post_norm", action="store_true", default=False)
    p.add_argument("--load_lms", action="store_true", default=True)
    p.add_argument("--load_wav", action="store_false", dest="load_lms")
    p.add_argument("--distributed", action="store_true", default=False)
    p.add_argument("--use_fp16", action="store_true", default=False)
    p.add_argument("--use_fp16_eval", action="store_true", default=False)
    p.add_argument("--name", type=str, default="")
    p.add_argument("--squeeze_excitation", action="store_true", default=False)
    p.add_argument("--mask", action="store_true", default=False)
    p.add_argument("--mask_ratio", type=float, default=0.0)
    p.add_argument("--random_mask_ratio", action="store_true", default=False)
    p.add_argument("--mask_ratio_schedule", action="store_true", default=False)
    p.add_argument("--mask_beta", type=float, default=0.3)
    p.add_argument("--no_token_drop", dest="token_drop", action="store_false",
                   default=True)
    p.add_argument("--remat", action="store_true", default=False)
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    p.add_argument("--fused_conv", action="store_true", default=None)
    p.add_argument("--no_fused_conv", dest="fused_conv", action="store_false")
    p.add_argument("--pool_reorder", action="store_true", default=None)
    p.add_argument("--no_pool_reorder", dest="pool_reorder",
                   action="store_false")
    p.add_argument("--fused_attention", action="store_true", default=None)
    p.add_argument("--no_fused_attention", dest="fused_attention",
                   action="store_false")
    p.add_argument("--layout_barrier", action="store_true", default=None)
    p.add_argument("--no_layout_barrier", dest="layout_barrier",
                   action="store_false")
    p.add_argument("--fast_mel", action="store_true", default=False)
    p.add_argument("--use_learned_pos_embd", action="store_true", default=False)
    p.add_argument("--use_cls", action="store_true", default=True)
    p.add_argument("--use_mean_pool", action="store_true", default=False)
    p.add_argument("--patch_size", nargs="+", type=int, default=[16, 16])
    p.add_argument("--masked_recon", action="store_true", default=False)
    p.add_argument("--stop_gradient", action="store_true", default=False)
    p.add_argument("--predictor", action="store_true", default=False)
    p.add_argument("--save_base_dir", type=str, default="")
    p.add_argument("--resume_path", type=str, default=None)
    p.add_argument("--optimizer", type=str, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr_weights", type=float, default=None)
    p.add_argument("--lr_biases", type=float, default=None)
    p.add_argument("--wd", type=float, default=None)
    # BYOL-variant flag (reference main_bt_byol.py:352)
    p.add_argument("--moving_average_decay", type=float, default=0.99)
    # old-gen (legacy) trainer recipe knobs (see Config field comments)
    p.add_argument("--base_lr", type=float, default=None)
    p.add_argument("--final_lr", type=float, default=1.0e-6)
    p.add_argument("--final_wd", type=float, default=None)
    p.add_argument("--warmup_epochs", type=int, default=6)
    p.add_argument("--momentum_teacher", type=float, default=0.996)
    p.add_argument("--warmup_teacher_temp", type=float, default=0.04)
    p.add_argument("--teacher_temp", type=float, default=0.4)
    p.add_argument("--warmup_teacher_temp_epochs", type=int, default=18)
    p.add_argument("--dino_out_dim", type=int, default=4096)
    p.add_argument("--proj_size", type=int, default=256)
    p.add_argument("--proj_dim", type=int, default=4096)
    # TPU-native extensions
    p.add_argument("--data_axis_size", type=int, default=0)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--fsdp", action="store_true", default=False)
    p.add_argument("--mixup_n_memory", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic_steps_per_epoch", type=int, default=100)
    p.add_argument("--synthetic_len", type=int, default=12800)
    p.add_argument("--profile_dir", type=str, default="")
    p.add_argument("--audioset_balanced_only", action="store_true", default=False)
    p.add_argument("--audioset_200k_only", action="store_true", default=False)
    # persistent XLA compilation cache (utils/compile_cache.py; on by default)
    p.add_argument("--no_compile_cache", action="store_true", default=False)
    p.add_argument("--compile_cache_dir", type=str, default=None)
    return p


def config_from_args(argv=None) -> Config:
    """CLI -> Config.  `--config path.yaml` loads yaml values first (the
    legacy tree's config style, old/configs/*.yaml — flat keys or nested
    sections are both flattened); explicit CLI flags override them."""
    parser = build_argparser()
    parser.add_argument("--config", type=str, default=None,
                        help="yaml config file; CLI flags override its values")
    import sys as _sys

    argv = list(_sys.argv[1:]) if argv is None else list(argv)
    args = parser.parse_args(argv)
    known = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in known}

    from ssl_audio_tpu.utils import compile_cache

    if args.no_compile_cache:
        compile_cache.disable()
    elif args.compile_cache_dir:
        compile_cache.enable(args.compile_cache_dir)

    if args.config:
        import yaml

        with open(args.config) as f:
            raw = yaml.safe_load(f) or {}

        def _flatten(node, out):
            for k, v in node.items():
                if isinstance(v, dict):   # nested legacy sections, any depth
                    _flatten(v, out)
                else:
                    out[k] = v

        flat = {}
        _flatten(raw, flat)
        # key aliases so the REFERENCE's own legacy yaml files
        # (old/configs/pretrain/*.yaml) load unmodified: their leaf names
        # for these hyperparameters differ from the active-tree CLI flags
        # this config mirrors (e.g. old/configs/pretrain/barlow.yaml
        # `lambd`/`base_lr`/`batch_size_per_gpu`/`save_epoch_it`)
        for src, dst in (("lambd", "lmbda"), ("base_lr", "lr"),
                         ("batch_size_per_gpu", "batch_size"),
                         ("save_epoch_it", "epoch_save_f"),
                         ("weight_decay", "wd"),
                         ("final_weight_decay", "final_wd"),
                         ("ema_decay", "moving_average_decay"),
                         ("out_dim", "dino_out_dim")):
            if src in flat and dst not in flat:
                # keep src too when it is itself a Config field (base_lr
                # feeds BOTH cfg.lr — the active-tree slot, r3-tested —
                # and cfg.base_lr, the old-gen recipe slot)
                flat[dst] = flat[src] if src in known else flat.pop(src)
        # CLI flags explicitly present on the command line win over yaml.
        # Resolve each option string through the parser's option->dest table
        # so negated flags register under their dest (e.g. --no_pool_reorder
        # must mark 'pool_reorder' explicit, or a yaml `pool_reorder: true`
        # silently overrides the CLI negation — ADVICE r3)
        opt_to_dest = {s: a.dest for s, a in
                       parser._option_string_actions.items()}
        explicit = set()
        for a in argv:
            if a.startswith("--"):
                opt = a.split("=")[0]
                explicit.add(opt_to_dest.get(opt, opt.lstrip("-")))
        for k, v in flat.items():
            if k in known and k not in explicit and v is not None:
                kw[k] = v
    return setup_model_defaults(Config(**kw))
