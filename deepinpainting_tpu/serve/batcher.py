"""Request-coalescing micro-batcher for production serving.

The reference serves strictly one request at a time (batchSize=1 is
hard-required, app.py:7, models/IPSR.py:35-36).  On TPU the economics
invert: the MXU runs the two-stage pipeline at ~2.5 ms for batch 1 but
~1.2 ms/image at batch 8 (BENCH_NOTES.md), so under concurrent load,
coalescing requests into one device call multiplies throughput ~2x
per chip while adding at most `wait_ms` of queueing latency.

Design: callers submit single items and block on a result; one worker
thread drains the queue, stacks up to `max_batch` items (waiting at most
`wait_ms` for stragglers after the first), PADS the stack to the fixed
`max_batch` so the jitted function compiles exactly once, runs the
supplied batched function, and distributes the per-item results.  Errors
in the batched call propagate to every waiting caller of that batch.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np


class _Pending:
    __slots__ = ("item", "event", "result", "error")

    def __init__(self, item):
        self.item = item
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Coalesce single-item calls into fixed-size batched calls.

    batched_fn: takes a dict of stacked arrays with leading axis
    `max_batch` and returns a sequence/array whose leading axis indexes
    items; only the first `n_real` rows are handed back to callers.
    """

    def __init__(self, batched_fn: Callable[[Dict[str, np.ndarray]], Any],
                 max_batch: int = 8, wait_ms: float = 2.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.batched_fn = batched_fn
        self.max_batch = max_batch
        self.wait_ms = wait_ms
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._closed = False
        # serializes enqueue vs close: an item enqueued under the lock is
        # guaranteed to sit AHEAD of the shutdown sentinel in the FIFO, so
        # the worker always processes it before exiting (no stranded caller
        # blocking out its full timeout).
        self._submit_lock = threading.Lock()
        self.batches_run = 0       # observability (asserted in tests)
        self.items_served = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- caller side ---------------------------------------------------------
    def submit(self, item: Dict[str, np.ndarray],
               timeout: Optional[float] = None):
        """Block until the item's result is available; raises the batch
        error if the device call failed.  The default timeout accommodates
        the FIRST call, which carries the jit compile (remote-TPU compiles
        of the batched graph have been observed to take >15 min on a busy
        compile server); steady-state calls return in milliseconds."""
        if timeout is None:
            timeout = float(os.environ.get("DIP_BATCH_TIMEOUT", "1800"))
        p = _Pending(item)
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError(f"batched inference exceeded {timeout}s")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self, timeout: Optional[float] = None):
        """Idempotent.  Blocks until the worker has finished every item
        enqueued before the close (in-flight device call included), but at
        most `timeout` seconds (default: DIP_BATCH_TIMEOUT, the same bound
        a submit() caller gets) — a device call hung on a tunnel outage
        must not hang server shutdown forever (ADVICE r3).  On timeout the
        queue is drained and stragglers failed; the daemon worker can't
        block process exit either way."""
        if timeout is None:
            timeout = float(os.environ.get("DIP_BATCH_TIMEOUT", "1800"))
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # wake the worker; FIFO => behind all items
        self._worker.join(timeout)
        timed_out = self._worker.is_alive()
        if timed_out:  # pragma: no cover - needs a hung call
            print(f"[batcher] worker still busy after {timeout}s close "
                  "wait (hung device call?); abandoning it", flush=True)
        # Fail any straggler rather than leaving a caller blocked for its
        # full timeout: normally empty (enqueue and close are serialized
        # above so nothing queues past the sentinel), non-empty only when
        # the join above timed out with items still queued.
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                break
            if p is not None:
                p.error = RuntimeError("batcher is closed")
                p.event.set()
        if timed_out:  # pragma: no cover - needs a hung call
            # the drain above may have consumed the shutdown sentinel; re-arm
            # it so the abandoned worker exits (instead of parking forever in
            # q.get()) if its hung device call ever returns
            self._q.put(None)

    # -- worker side ---------------------------------------------------------
    def _collect(self) -> Optional[List[_Pending]]:
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        # wait up to wait_ms for stragglers, then take whatever is queued
        t_end = time.monotonic() + self.wait_ms / 1000.0
        while len(batch) < self.max_batch:
            remaining = t_end - time.monotonic()
            try:
                nxt = self._q.get(timeout=max(0.0, remaining))
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-arm shutdown for the outer loop
                break
            batch.append(nxt)
            if remaining <= 0:
                break
        return batch

    def _run(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            n = len(batch)
            try:
                keys = batch[0].item.keys()
                stacked = {}
                for k in keys:
                    rows = [np.asarray(p.item[k]) for p in batch]
                    pad = self.max_batch - n
                    if pad:  # pad with the last row: one static jit shape
                        rows.extend([rows[-1]] * pad)
                    stacked[k] = np.stack(rows)
                out = self.batched_fn(stacked)
                for i, p in enumerate(batch):
                    p.result = _index_result(out, i)
                self.batches_run += 1
                self.items_served += n
            except BaseException as e:  # propagate to all callers
                for p in batch:
                    p.error = e
            finally:
                for p in batch:
                    p.event.set()


def _index_result(out, i: int):
    """Pick item i out of a batched result (array, tuple of arrays, or
    dict of arrays)."""
    if isinstance(out, dict):
        return {k: np.asarray(v)[i] for k, v in out.items()}
    if isinstance(out, (tuple, list)):
        return type(out)(np.asarray(v)[i] for v in out)
    return np.asarray(out)[i]
