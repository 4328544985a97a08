"""Worker for test_multihost: joins a 2-process jax.distributed CPU cluster
(via init_distributed's JAX_COORDINATOR_ADDRESS env path), runs the FULL
Barlow-Twins train step over the global 4-device mesh with each process
feeding its local half of the batch, and asserts the loss matches the
single-process value (GSPMD sharding-invariance across process boundaries).
"""
import os
import sys
import types

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssl_audio_tpu.parallel.mesh import init_distributed  # noqa: E402

init_distributed(types.SimpleNamespace(distributed=True))

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from ssl_audio_tpu.config import default_config  # noqa: E402
from ssl_audio_tpu.train.state import init_train_state  # noqa: E402
from ssl_audio_tpu.train.steps import make_train_step  # noqa: E402


def main():
    expected = float(sys.argv[1])
    assert jax.process_count() == 2
    pid = jax.process_index()

    cfg = default_config(
        model_type="audiontt", batch_size=16, projector_hidden_dim=64,
        projector_out_dim=16, mixup_n_memory=32, epochs=2, mixup=False,
    )
    mods, state = init_train_state(cfg, jax.random.key(0))
    mesh = Mesh(np.array(jax.devices()), ("data",))
    rep = NamedSharding(mesh, P())
    # replicate the (identical per-process) state over the global mesh
    state = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), rep) if hasattr(x, "shape") else x,
        jax.device_get(state),
    )
    step = make_train_step(mods, donate=False)

    full = np.random.default_rng(7).standard_normal((16, 1, 64, 96)).astype(np.float32)
    local = full[pid * 8 : (pid + 1) * 8]
    batch = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    assert len(batch.sharding.device_set) == 4

    _, metrics = step(state, batch, jax.random.key(1), np.float32(0.0))
    loss = float(metrics["loss"])
    assert abs(loss - expected) / abs(expected) < 1e-4, (loss, expected)
    print(f"MULTIHOST_STEP_OK {pid} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
