"""ssl_audio_tpu — a TPU-native (JAX/XLA/Pallas) framework for self-supervised
audio representation learning, with the capabilities of jonahanton/SSL_audio
("Audio Barlow Twins", ICASSP 2023).

Design stance (not a port):
  * The whole training step — mel frontend, two-view augmentation, dual encoder
    forward, Barlow-Twins loss, optimizer update — is ONE jit-compiled function
    running on device. The reference's CPU DataLoader-worker augmentation chain
    (its hot loop) becomes batched RNG-keyed device ops.
  * Data parallelism is expressed with `jax.sharding.Mesh` + sharding
    annotations; XLA/GSPMD inserts the collectives the reference issues by hand
    (DDP gradient all-reduce, the D×D correlation-matrix all-reduce at
    utils/loss.py:21, SyncBatchNorm).
  * The hot frontend (frames → windowed DFT → mel → log) is GEMM-native so it
    runs on the MXU, with a fused Pallas kernel on TPU.
"""

__version__ = "0.1.0"

from ssl_audio_tpu.config import Config, default_config  # noqa: F401
from ssl_audio_tpu.utils import compile_cache as _compile_cache

# Persistent XLA compilation cache, on by default for every entry point
# (opt out: SSL_AUDIO_TPU_COMPILE_CACHE=0 or --no_compile_cache).
_compile_cache.init_from_env()
