"""Threaded prefetching data loader.

Replaces torch DataLoader + DistributedSampler (reference main.py:303-309):
per-epoch shuffled indices, optional process-sharding for multi-host, a
thread pool for `.npy` loads, and double-buffered prefetch so host IO overlaps
device compute.  Heavy per-sample augmentation is gone from the host path (it
runs on device), so workers only read + crop + normalize.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1 and not drop_last:
            # a ragged tail global batch would split unevenly across
            # processes and desync their dispatch counts
            raise ValueError("multi-process loading requires drop_last=True")
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    @property
    def _global_batch(self) -> int:
        """Rows per assembled global batch.  `batch_size` is the PER-PROCESS
        yield; multi-host sharding is per-batch contiguous (DistributedSampler
        equivalent, reference main.py:303-309): global batch b is
        idx[b*G:(b+1)*G] and process p supplies rows [p*L:(p+1)*L] of it, so
        concatenating the process shards in process order reproduces the
        single-process batch rows exactly (the runs then differ only by
        collective reduction order, not by data)."""
        return self.batch_size * self.process_count

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self._global_batch
        return (n + self._global_batch - 1) // self._global_batch

    def _collate(self, items) -> Tuple[np.ndarray, np.ndarray]:
        xs = np.stack([it[0] for it in items])
        ys = np.stack([np.asarray(it[1]) for it in items])
        return xs, ys

    def _native_reader(self):
        """C++ batch-assembly fast path: available when the dataset exposes
        batch_paths() and the native lib builds — `.npy` lms reads
        (NativeBatchReader) or raw wav decodes (NativeWavReader, for
        returns_wav datasets like AudioSetWav)."""
        if not getattr(self.dataset, "supports_native", False):
            return None
        try:
            cfg = self.dataset.cfg
            if getattr(self.dataset, "returns_wav", False):
                from ssl_audio_tpu.data.native_loader import NativeWavReader

                return NativeWavReader(
                    self.dataset.unit_length, cfg.sample_rate,
                    n_threads=self.num_workers,
                )
            from ssl_audio_tpu.data.native_loader import NativeBatchReader

            norm = self.dataset.norm_stats or (0.0, 1.0)
            return NativeBatchReader(
                cfg.n_mels, self.dataset.crop_frames, norm[0], norm[1],
                n_threads=self.num_workers,
            )
        except (RuntimeError, AttributeError):
            return None

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self._indices()
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        native = self._native_reader()

        def produce_batch(pool, b):
            g0 = b * self._global_batch
            batch_idx = idx[g0 + self.process_index * self.batch_size
                            : g0 + (self.process_index + 1) * self.batch_size]
            if native is not None:
                paths, labels = self.dataset.batch_paths(batch_idx)
                xs = native.read(paths, seed=self.seed * 1_000_003 + self.epoch * 131 + b)
                return xs, np.stack(labels)
            items = list(pool.map(self.dataset.__getitem__, batch_idx))
            return self._collate(items)

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        try:
                            q.put(produce_batch(pool, b))
                        except IOError:
                            # native path failed (e.g. corrupt file): fall
                            # back to the python path for this batch (which
                            # applies the dataset's own fallback policy,
                            # datasets.py:335-340)
                            g0 = b * self._global_batch
                            p0 = g0 + self.process_index * self.batch_size
                            batch_idx = idx[p0 : p0 + self.batch_size]
                            items = list(pool.map(self.dataset.__getitem__, batch_idx))
                            q.put(self._collate(items))
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
