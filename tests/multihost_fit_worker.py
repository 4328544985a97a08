"""Worker for test_multihost's end-to-end fit test: joins a 2-process
jax.distributed CPU cluster and runs the FULL Trainer.fit loop twice —
2 epochs with a rank-0 Orbax checkpoint write, then a fresh Trainer resumed
from that checkpoint for epochs 3-4 — over sharded loaders (each process
feeds its contiguous half of every global batch).  The final-epoch loss must
match the single-process oracle run with the same protocol (passed in argv):
the loader's per-batch contiguous sharding reproduces single-process batch
row order and GSPMD compiles the same global program, so the runs differ
only by collective reduction order (1 proc x 4 devices vs 2 procs x 2
devices sum in different orders, ~6e-7 rel at epoch 1) which training
dynamics amplify — measured 2.7e-4 rel by epoch 4, hence the 1e-3 gate
(reference: utils/utils.py:335-361 DDP rendezvous + main.py:484-496
rank-0 save + resume).
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
from jax.experimental import multihost_utils  # noqa: E402

from ssl_audio_tpu.config import default_config  # noqa: E402
from ssl_audio_tpu.train.loop import Trainer  # noqa: E402


def make_cfg(epochs):
    return default_config(
        model_type="audiontt", dataset="synthetic", batch_size=16,
        projector_hidden_dim=64, projector_out_dim=16, mixup_n_memory=32,
        mixup=False, epochs=epochs, epoch_save_f=2, no_eval=True,
        synthetic_steps_per_epoch=3, num_workers=2, data_axis_size=4,
    )


def main():
    expected = float(sys.argv[1])
    ckpt_dir = sys.argv[2]
    assert jax.process_count() == 2
    pid = jax.process_index()

    # leg 1: 2 epochs, rank-0 Orbax write at epoch 2 (fit handles the
    # process_index gate itself)
    tr1 = Trainer(make_cfg(2))
    assert tr1.loader.batch_size == 8          # per-process half-batch
    assert len(tr1.loader) == 3                # global batches per epoch
    tr1.fit(ckpt_path=ckpt_dir)
    ckpt = os.path.join(ckpt_dir, "model_2")
    # rank 0 finished writing before anyone reads
    multihost_utils.sync_global_devices("ckpt_written")
    assert os.path.exists(ckpt), f"rank-0 checkpoint missing at {ckpt}"

    # leg 2: fresh Trainer, resume at epoch 3, run 3-4; record epoch losses
    tr2 = Trainer(make_cfg(4))
    losses = []
    orig = tr2.train_one_epoch

    def recording(epoch):
        loss = orig(epoch)
        losses.append((epoch, loss))
        return loss

    tr2.train_one_epoch = recording
    tr2.fit(resume_path=ckpt)
    assert [e for e, _ in losses] == [3, 4], losses
    final = losses[-1][1]
    assert abs(final - expected) / abs(expected) < 1e-3, (final, expected)
    print(f"MULTIHOST_FIT_OK {pid} {final:.6f}", flush=True)


if __name__ == "__main__":
    main()
