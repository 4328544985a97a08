"""Persistent XLA compilation cache (TPU-first usability; no reference
equivalent).

First compile of a new HLO through the remote-TPU tunnel costs minutes
(PERF.md records ~75 s per recompile, BENCH_r04 warmup 194.5 s), and every
CLI invocation used to pay it again.  JAX's persistent compilation cache
stores the serialized executable keyed on (HLO, compile options, jaxlib
version, platform), so a second invocation of the same entry point loads
from disk instead of recompiling.

Enabled automatically on `import ssl_audio_tpu` (see __init__.py); controls:

  * env  SSL_AUDIO_TPU_COMPILE_CACHE=0|off   -> disabled
  * env  SSL_AUDIO_TPU_COMPILE_CACHE=<path>  -> custom cache directory
  * flag --no_compile_cache                  -> disabled (via config_from_args)
  * flag --compile_cache_dir <path>          -> custom cache directory

Default location: ~/.cache/ssl_audio_tpu/xla — shared across runs and entry
points so `bench.py`, `main.py`, the sweep driver, and the tests all hit the
same cache.  Safe cross-platform: the cache key includes the backend, so CPU
(test) and TPU entries never collide.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ssl_audio_tpu", "xla"
)

_state = {"dir": None}


def enable(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir` (created if
    missing).  Idempotent; returns the active directory."""
    import jax

    cache_dir = cache_dir or DEFAULT_DIR
    if _state["dir"] != cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min_compile_time (1 s) skips trivial programs; keep it.
        # NOTE: do NOT set jax_persistent_cache_enable_xla_caches="all" —
        # on CPU it additionally persists XLA AOT kernel caches whose
        # machine-feature stamps spam E-level warnings on every load (and
        # carry a SIGILL footgun across hosts); the client-side executable
        # cache alone is what gives the TPU warmup win.
        _state["dir"] = cache_dir
    return cache_dir


def disable() -> None:
    """Turn the persistent cache off for this process."""
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    _state["dir"] = None


def enabled_dir() -> str | None:
    return _state["dir"]


def init_from_env() -> None:
    """Import-time hook: honor SSL_AUDIO_TPU_COMPILE_CACHE, default ON."""
    val = os.environ.get("SSL_AUDIO_TPU_COMPILE_CACHE", "")
    if val.lower() in ("0", "off", "false", "no"):
        return
    enable(val if val and os.path.isabs(val) else None)
