"""Batching data loader with background host workers and device prefetch.

TPU-native replacement for torch DataLoader (reference:
datasets/data_loaders.py): a thread pool decodes/preprocesses samples on the
host while the previous batch trains, and finished batches are device_put
ahead of time so the accelerator never waits on IO.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax
import numpy as np

__all__ = ["DataLoader"]


def _collate(samples: list[dict]) -> dict:
    def stack(vals):
        if isinstance(vals[0], dict):
            return {k: stack([v[k] for v in vals]) for k in vals[0]}
        if isinstance(vals[0], np.ndarray):
            return np.stack(vals)
        return list(vals)

    return stack(samples)


class DataLoader:
    """Iterates dict batches. ``device_put_fn`` (e.g. a sharding placement)
    runs on the prefetch thread."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 123,
        device_put_fn: Callable | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.device_put_fn = device_put_fn or jax.device_put

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> list[list[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        out = []
        for i in range(0, len(idx), self.batch_size):
            b = idx[i : i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                continue
            out.append(list(b))
        return out

    def __iter__(self) -> Iterator[dict]:
        batches = self._batches()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, b))
                        batch = _collate(samples)
                        arrays = {
                            k: v for k, v in batch.items() if not isinstance(v, list)
                        }
                        rest = {k: v for k, v in batch.items() if isinstance(v, list)}
                        placed = self.device_put_fn(arrays)
                        placed.update(rest)
                        q.put(placed)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
