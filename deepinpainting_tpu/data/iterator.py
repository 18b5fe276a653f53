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

# NOTE: parallel.mesh (and through it jax) is imported lazily inside the
# functions that need it, so spawned data-loader worker processes can
# import this module without paying (or touching) the jax runtime.


class BatchIterator:
    """One shuffled epoch of stacked NHWC batches {'image','mask','ref'}.

    drop_last keeps shapes static across steps (one jit compilation),
    which on TPU is worth far more than the tail fraction of an epoch.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, workers: int = 0,
                 backend: str = "process", rows: Optional[tuple] = None):
        if drop_last and len(dataset) < batch_size:
            raise ValueError(
                f"dataset has {len(dataset)} items < batch_size "
                f"{batch_size} with drop_last — every epoch would be empty")
        self.dataset = dataset
        self.batch_size = batch_size
        # rows=(lo, hi): materialize only this [lo, hi) slice of every
        # GLOBAL batch — multi-host training, where each process decodes
        # just the rows its devices hold (parallel.mesh.process_batch_rows)
        # while the shuffle order and the per-item augmentation generators
        # stay seed-identical across processes (the full batch's rng spawn
        # happens everywhere; only the fetches are sliced).
        if rows is not None:
            lo, hi = rows
            if not (0 <= lo < hi <= batch_size):
                raise ValueError(f"rows={rows} must be a non-empty slice of "
                                 f"[0, {batch_size})")
            if not drop_last:
                # multi-host row slicing only makes sense for full
                # fixed-size global batches: a short tail batch would make
                # the [lo, hi) slice inconsistent with the global assembly
                # (or empty) — reject the combination instead of clamping
                # (ADVICE r4)
                raise ValueError(
                    "rows requires drop_last=True (multi-host decode "
                    "slices fixed-size global batches; a ragged tail "
                    "batch has no consistent per-process rows)")
        self.rows = rows
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        # workers > 0: decode a batch's items in parallel — the role of
        # DataLoader num_workers. backend "process" scales (PIL decode and
        # the numpy augmentations hold the GIL: threads measure FLAT at
        # ~116 img/s @256px, processes ~4x that); "thread" is the
        # zero-setup-cost fallback. Each item gets its own spawned child
        # generator either way, so augmentation stays deterministic per
        # seed and generators are never shared across workers. The process
        # pool lives on the DATASET and persists across epochs/iterators.
        if backend not in ("process", "thread"):
            raise ValueError(f"unknown loader backend {backend!r}")
        if workers < 0:  # auto: parallel decode only helps with spare cores
            import os as _os
            workers = min(8, max(0, (_os.cpu_count() or 1) - 1))
        self.workers = workers if hasattr(dataset, "fetch") else 0
        self.backend = backend
        self._tpool = None
        if self.workers > 0 and backend == "thread":
            from concurrent.futures import ThreadPoolExecutor
            self._tpool = ThreadPoolExecutor(max_workers=workers)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def _rows(self, n: int) -> tuple:
        # rows implies drop_last (checked in __init__), so n is always the
        # full batch_size here — no clamping needed
        return (0, n) if self.rows is None else self.rows

    def _load(self, idx) -> list:
        # every path draws the SAME per-item spawned child generators, so
        # the produced data stream is bit-identical for a given seed no
        # matter the worker count or backend — training is reproducible
        # across hosts whose data_workers=-1 resolves differently
        lo, hi = self._rows(len(idx))
        if hasattr(self.dataset, "fetch"):
            # spawn the FULL batch's generators (keeps the stream identical
            # across processes with different rows), fetch only [lo, hi)
            rngs = self.rng.spawn(len(idx))[lo:hi]
            idx = idx[lo:hi]
            if self.workers > 0 and self.backend == "thread":
                return list(self._tpool.map(self.dataset.fetch,
                                            [int(i) for i in idx], rngs))
            return [self.dataset.fetch(int(i), r)
                    for i, r in zip(idx, rngs)]
        return [self.dataset[int(i)] for i in idx[lo:hi]]

    def __del__(self):
        if getattr(self, "_tpool", None) is not None:
            self._tpool.shutdown(wait=False)

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.workers > 0 and self.backend == "process":
            yield from self._iter_process()
            return
        for idx in self._batch_indices():
            items = self._load(idx)
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}

    def _iter_process(self) -> Iterator[Dict[str, np.ndarray]]:
        """Whole batches assembled in worker processes, `workers + 2`
        batches in flight — one IPC round-trip per batch.  rngs are
        spawned in submission order, so results are bit-identical to the
        thread/serial fetch(rng) paths for the same seed."""
        from collections import deque
        from .dataset import _pool_fetch_batch
        pool = self.dataset.get_pool(self.workers)

        def submit(idx):
            lo, hi = self._rows(len(idx))
            rngs = self.rng.spawn(len(idx))[lo:hi]
            return pool.submit(_pool_fetch_batch,
                               [int(i) for i in idx[lo:hi]], rngs)

        it = self._batch_indices()
        futs = deque()
        for idx in it:
            futs.append(submit(idx))
            if len(futs) >= self.workers + 2:
                break
        while futs:
            batch = futs.popleft().result()
            nxt = next(it, None)
            if nxt is not None:
                futs.append(submit(nxt))
            yield batch


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
    """Prefetched batches, placed on the mesh (sharded over `axis`).

    Placement (`shard_batch` -> jax.device_put) runs INSIDE the prefetch
    worker thread, so batch k+1's host->device upload overlaps step k's
    device execution — the role a pinned-memory copy stream plays in a
    torch input pipeline.  Before this the upload was serialized with the
    step dispatch in the consumer loop (~90 ms of a 135 ms/step trainer
    wall at 256px b8 over the axon tunnel, BENCH_NOTES.md round 3); the
    queue holds at most `depth` device-resident batches ahead.
    """
    import os
    from ..parallel import mesh as pmesh
    if mesh is None:
        yield from prefetch(iterable, depth)
        return

    if os.environ.get("DIP_PLACE_IN_CONSUMER", "0") == "1":
        # measurement-only A/B escape hatch (scripts/wall_probe.py): place
        # in the consumer loop, serializing upload with step dispatch.
        for batch in prefetch(iterable, depth):
            yield pmesh.shard_batch(batch, mesh, axis)
        return

    def placed():
        for batch in iterable:
            yield pmesh.shard_batch(batch, mesh, axis)

    yield from prefetch(placed(), depth)


def shard_batch(batch, mesh, axis: str = "data"):
    from ..parallel import mesh as pmesh
    return pmesh.shard_batch(batch, mesh, axis)
