"""CIFAR-10 dataset (reference main.py:258-267 uses torchvision.datasets.
CIFAR10 + CifarPairTransform) from the standard on-disk python-pickle batches
(data/cifar-10-batches-py).  No downloading (zero-egress environment): raises
with instructions when absent."""
from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np


def load_cifar10(data_dir: str = "data", train: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images uint8 (N, 32, 32, 3), labels int (N,))."""
    base = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f"{base} not found: place the extracted CIFAR-10 python batches "
            "(cifar-10-python.tar.gz) under data/."
        )
    files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    xs, ys = [], []
    for fname in files:
        with open(os.path.join(base, fname), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.extend(d[b"labels"])
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return x.astype(np.uint8), np.asarray(ys, np.int64)


class Cifar10:
    """Minimal dataset view: __getitem__ -> (HWC uint8 image, int label)."""

    def __init__(self, data_dir: str = "data", train: bool = True):
        self.images, self.labels = load_cifar10(data_dir, train)
        self.label_num = 10

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return self.images[idx], np.int32(self.labels[idx])
