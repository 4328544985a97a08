"""Test configuration: force an 8-virtual-device CPU backend so sharding /
collective paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

# keep the suite hermetic: no persistent compilation cache (CPU AOT
# reloads also spam machine-feature E-warnings into every captured stderr)
os.environ.setdefault("SSL_AUDIO_TPU_COMPILE_CACHE", "0")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overwrites
# jax_platforms; reassert CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
