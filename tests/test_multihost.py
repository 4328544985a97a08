"""Multi-process (multi-host-shaped) data parallelism: 2 jax.distributed CPU
processes run the full train step over a global mesh and reproduce the
single-process loss.  Exercises init_distributed (parallel/mesh.py:19-45) —
the TPU-pod path the reference covers with torch DDP init_distributed_mode
(utils.py:335-361)."""
import os
import socket
import subprocess
import sys

import jax
import numpy as np

from ssl_audio_tpu.train.state import init_train_state
from ssl_audio_tpu.train.steps import make_train_step
from tests.test_train_step import make_batch, small_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class TestMultiProcess:
    def test_two_process_step_matches_single(self, rng):
        # single-process oracle (same cfg/key/batch as the worker)
        cfg = small_cfg(batch_size=16, mixup=False)
        mods, state = init_train_state(cfg, jax.random.key(0))
        step = make_train_step(mods, donate=False)
        batch = np.random.default_rng(7).standard_normal(
            (16, 1, 64, 96)
        ).astype(np.float32)
        _, metrics = step(state, jax.numpy.asarray(batch), jax.random.key(1),
                          np.float32(0.0))
        expected = float(metrics["loss"])

        port = _free_port()
        env_base = {k: v for k, v in os.environ.items()
                    if not k.startswith(("JAX_", "XLA_"))}
        procs = []
        for pid in range(2):
            env = dict(
                env_base,
                JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(pid),
            )
            procs.append(subprocess.Popen(
                [sys.executable, WORKER, repr(expected)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            ))
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
            assert f"MULTIHOST_STEP_OK {pid}" in out
