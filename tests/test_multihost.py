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

    def test_two_process_fit_ckpt_resume_matches_single(self, tmp_path):
        """End-to-end 2-process Trainer.fit (VERDICT r3 #4): sharded loaders
        (per-batch contiguous halves), rank-0 Orbax write at epoch 2, resume
        into a fresh Trainer for epochs 3-4 — final-epoch loss matches the
        single-process run of the identical 2+resume+2 protocol to 1e-3
        (collective reduction-order noise amplified by training; see the
        worker docstring for the measured ladder)."""
        from ssl_audio_tpu.train.loop import Trainer

        # single-process oracle: same protocol on a 4-device mesh
        def make_cfg(epochs):
            from ssl_audio_tpu.config import default_config

            return default_config(
                model_type="audiontt", dataset="synthetic", batch_size=16,
                projector_hidden_dim=64, projector_out_dim=16,
                mixup_n_memory=32, mixup=False, epochs=epochs,
                epoch_save_f=2, no_eval=True, synthetic_steps_per_epoch=3,
                num_workers=2, data_axis_size=4,
            )

        oracle_dir = str(tmp_path / "oracle_ckpt")
        tr1 = Trainer(make_cfg(2))
        tr1.fit(ckpt_path=oracle_dir)
        tr2 = Trainer(make_cfg(4))
        losses = []
        orig = tr2.train_one_epoch
        tr2.train_one_epoch = lambda e: (losses.append(orig(e)) or losses[-1])
        tr2.fit(resume_path=os.path.join(oracle_dir, "model_2"))
        expected = losses[-1]

        worker = os.path.join(REPO, "tests", "multihost_fit_worker.py")
        ckpt_dir = str(tmp_path / "mp_ckpt")
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
                [sys.executable, worker, repr(expected), ckpt_dir],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            ))
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
            assert f"MULTIHOST_FIT_OK {pid}" in out
