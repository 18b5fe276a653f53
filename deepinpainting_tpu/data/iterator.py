"""Batching + prefetching iterator over a host dataset.

Replaces the reference's torch DataLoader(batch_size=1, shuffle=True)
(train.ipynb cell 1).  TPU-native differences: real batches (the attention
kernel is vmap-batched, so batch>1 works), a background prefetch thread so
host image decode overlaps device compute, and `shard_batch` placement of
the leading axis over the data mesh (multi-chip DP).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np

from ..parallel import mesh as pmesh


class BatchIterator:
    """One shuffled epoch of stacked NHWC batches {'image','mask','ref'}.

    drop_last keeps shapes static across steps (one jit compilation),
    which on TPU is worth far more than the tail fraction of an epoch.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True):
        if drop_last and len(dataset) < batch_size:
            raise ValueError(
                f"dataset has {len(dataset)} items < batch_size "
                f"{batch_size} with drop_last — every epoch would be empty")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            items = [self.dataset[int(i)] for i in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


def prefetch(iterable, depth: int = 2):
    """Run an iterator in a daemon thread with a bounded queue so host-side
    decode/augment overlaps device steps (the role of DataLoader workers)."""
    q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
    _end = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)
        q.put(_end)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def device_batches(iterable, mesh=None, axis: str = "data", depth: int = 2):
    """Prefetched batches, placed on the mesh (sharded over `axis`)."""
    for batch in prefetch(iterable, depth):
        if mesh is not None:
            batch = pmesh.shard_batch(batch, mesh, axis)
        yield batch


shard_batch = pmesh.shard_batch
