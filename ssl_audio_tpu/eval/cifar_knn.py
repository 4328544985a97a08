"""Per-epoch CIFAR-10 kNN monitor (reference main.py:479-483 +
utils.py:192-235): weighted-cosine kNN of encoder embeddings over the train
bank, scored on the test set."""
from __future__ import annotations

import jax
import numpy as np

from ssl_audio_tpu.augment.cifar import cifar_eval_batch
from ssl_audio_tpu.data.cifar10 import Cifar10
from ssl_audio_tpu.data.pipeline import DataLoader
from ssl_audio_tpu.eval.knn import eval_knn


def make_cifar_knn_eval_fn(cfg, data_dir: str = "data", wandb_run=None):
    memory = Cifar10(data_dir, train=True)
    test = Cifar10(data_dir, train=False)
    mem_loader = DataLoader(memory, cfg.batch_size, shuffle=False, drop_last=False,
                            num_workers=cfg.num_workers)
    test_loader = DataLoader(test, cfg.batch_size, shuffle=False, drop_last=False,
                             num_workers=cfg.num_workers)

    def eval_fn(mods, state, epoch):
        params = jax.device_get(state.params)
        bs = jax.device_get(state.batch_stats)

        @jax.jit
        def forward(x_u8):
            x = cifar_eval_batch(x_u8)
            out, _ = mods.apply_encoder(params["encoder"], bs["encoder"], x, train=False)
            return out

        top1, top5 = eval_knn(forward, iter(mem_loader), iter(test_loader), 10)
        print(f"[epoch {epoch}] cifar10 kNN top1={top1:.2f}% top5={top5:.2f}%")
        if wandb_run is not None:
            wandb_run.log({"knn_test_acc_1": top1, "knn_test_acc_5": top5})
        return {"knn_top1": top1, "knn_top5": top5}

    return eval_fn
