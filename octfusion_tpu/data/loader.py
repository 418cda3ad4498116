"""Infinite shuffling sampler + threaded prefetch loader.

Equivalent of ``InfSampler`` / ``DistributedInfSampler``
(`/root/reference/datasets/sampler.py:12-57`): an endless stream of
reshuffled epochs, optionally strided across hosts
(``jax.process_index()`` replacing torch ranks).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .dataset import collate


class InfiniteSampler:
    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 rank: int = 0, world_size: int = 1):
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            order = np.arange(self.size)
            if self.shuffle:
                rng = np.random.RandomState(self.seed + epoch)
                rng.shuffle(order)
            for i in range(self.rank, self.size, self.world_size):
                yield int(order[i])
            epoch += 1


class DataLoader:
    """Batches samples on background threads, yields collated numpy dicts."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 2,
                 rank: int = 0, world_size: int = 1, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = InfiniteSampler(
            len(dataset), shuffle, seed, rank, world_size
        )
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._q: Optional[queue.Queue] = None
        self._threads = []
        self._stop = threading.Event()

    def __len__(self):
        return max(1, len(self.dataset) // (self.batch_size * self.sampler.world_size))

    def _worker(self, idx_q: queue.Queue):
        while not self._stop.is_set():
            try:
                idxs = idx_q.get(timeout=0.5)
            except queue.Empty:
                continue
            batch = collate([self.dataset[i] for i in idxs])
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        self._q = queue.Queue(maxsize=self.prefetch)
        idx_q: queue.Queue = queue.Queue(maxsize=self.prefetch * 2)
        self._stop.clear()

        def feeder():
            it = iter(self.sampler)
            while not self._stop.is_set():
                idxs = [next(it) for _ in range(self.batch_size)]
                while not self._stop.is_set():
                    try:
                        idx_q.put(idxs, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._threads = [threading.Thread(target=feeder, daemon=True)]
        for _ in range(self.num_workers):
            self._threads.append(
                threading.Thread(target=self._worker, args=(idx_q,), daemon=True)
            )
        for t in self._threads:
            t.start()
        try:
            while True:
                yield self._q.get()
        finally:
            self._stop.set()

    def stop(self):
        self._stop.set()
