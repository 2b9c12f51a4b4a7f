"""Host data loading: sharded, shuffled, prefetched batches of padded slots.

The TPU replacement for torch DataLoader + DistributedSampler
(`engines/train.py:283-314`): per-process shard of a deterministic per-epoch
permutation, padded-slot collation (see collate.py), a background-thread
prefetch queue overlapping host preprocessing with device steps, and a
``num_workers`` pool preparing samples in parallel (threads, not processes:
the transform pipeline is numpy-heavy and releases the GIL in its hot ops,
and forking after JAX/XLA initialization risks deadlocking runtime threads —
the failure mode torch sidesteps by spawning workers before CUDA init).
``MultiDatasetLoader`` mirrors the PPT ``MultiDatasetDataloader``
(`datasets/dataloader.py:23`) round-robin over per-dataset loaders whose
``loop`` encodes the mix ratio.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .collate import collate


class Dataloader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        slot_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        mix_prob: float = 0.0,
        seed: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
        prefetch: int = 2,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.slot_size = slot_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.mix_prob = mix_prob
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._pool = None
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # shard, dropping the tail so every shard sees the same batch count
        per_shard = n // self.num_shards
        order = order[self.shard_id * per_shard : (self.shard_id + 1) * per_shard]
        return order

    def __len__(self):
        per_shard = len(self.dataset) // self.num_shards
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def _samples(self, order):
        """Yield prepared samples in order, ``num_workers``-parallel."""
        if self.num_workers <= 0:
            for idx in order:
                yield self.dataset[int(idx)]
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        window = self.num_workers * 2
        futs: deque = deque()
        it = iter(order)
        for idx in it:
            futs.append(self._pool.submit(self.dataset.__getitem__, int(idx)))
            if len(futs) >= window:
                yield futs.popleft().result()
        while futs:
            yield futs.popleft().result()

    def _produce(self, out_q: queue.Queue):
        try:
            batch = []
            for sample in self._samples(self._indices()):
                batch.append(sample)
                if len(batch) == self.batch_size:
                    out_q.put(collate(batch, self.slot_size, self.mix_prob))
                    batch = []
            if batch and not self.drop_last:
                out_q.put(collate(batch, self.slot_size, self.mix_prob))
        except BaseException as e:  # propagate into the consumer
            out_q.put(e)
        finally:
            out_q.put(None)

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            batch = []
            for sample in self._samples(self._indices()):
                batch.append(sample)
                if len(batch) == self.batch_size:
                    yield collate(batch, self.slot_size, self.mix_prob)
                    batch = []
            if batch and not self.drop_last:
                yield collate(batch, self.slot_size, self.mix_prob)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        worker = threading.Thread(target=self._produce, args=(q,), daemon=True)
        worker.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


class MultiDatasetLoader:
    """Round-robin over per-dataset loaders; ratios via per-dataset ``loop``."""

    def __init__(self, loaders):
        self.loaders = list(loaders)

    def set_epoch(self, epoch: int):
        for loader in self.loaders:
            loader.set_epoch(epoch)

    def __len__(self):
        return sum(len(ldr) for ldr in self.loaders)

    def __iter__(self):
        iters = [iter(ldr) for ldr in self.loaders]
        active = list(range(len(iters)))
        while active:
            for i in list(active):
                try:
                    yield next(iters[i])
                except StopIteration:
                    active.remove(i)
