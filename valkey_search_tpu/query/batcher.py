"""Query batcher: concurrent KNN searches coalesce into one kernel launch.

Reference P1 (SURVEY.md §2.5): every FT.SEARCH runs on a reader-pool
thread (valkey_search.cc:1161-1164, vmsdk/src/thread_pool.h) and scales
with cores. The TPU-native equivalent is *batching*: one chip runs one
program at a time, so concurrent queries against the same index are
stacked on the host within a short window and executed as a single
`search_batch` device call — per-launch overhead and the corpus stream
amortize across the whole batch (the same reason bench.py batches 1024
queries). Leader-based: the first arrival waits `search.query-batch-
window-us`, grabs everything queued behind it (up to
`search.query-max-batch`), launches once, and distributes results.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.metrics import STATS


class _PendingQuery:
    __slots__ = ("vector", "future")

    def __init__(self, vector: np.ndarray):
        self.vector = vector
        self.future: Future = Future()


class VectorQueryBatcher:
    """Batches (index, k, ef, metric) compatible single-vector searches."""

    def __init__(self):
        self._lock = threading.Lock()
        self._queues: Dict[tuple, List[_PendingQuery]] = {}
        self._leaders: Dict[tuple, bool] = {}

    def submit(
        self,
        index,
        vector: np.ndarray,
        k: int,
        ef: Optional[int],
    ) -> Future:
        """Queue one query; returns a Future of (dists [k], ids [k])."""
        sig = (id(index), k, ef)
        q = _PendingQuery(np.asarray(vector, np.float32).reshape(-1))
        with self._lock:
            self._queues.setdefault(sig, []).append(q)
            leader = not self._leaders.get(sig, False)
            if leader:
                self._leaders[sig] = True
        if leader:
            self._run_as_leader(sig, index, k, ef)
        return q.future

    def _run_as_leader(self, sig: tuple, index, k: int, ef: Optional[int]) -> None:
        window_s = float(config.get("search.query-batch-window-us")) / 1e6
        max_batch = int(config.get("search.query-max-batch"))
        if window_s > 0:
            # let followers pile up behind the leader
            threading.Event().wait(window_s)
        with self._lock:
            batch = self._queues.pop(sig, [])
            self._leaders[sig] = False
        if not batch:
            return
        while batch:
            chunk, batch = batch[:max_batch], batch[max_batch:]
            try:
                queries = np.stack([p.vector for p in chunk])
                if ef is not None:
                    d, ids = index.search_batch(queries, k, ef=ef)
                else:
                    d, ids = index.search_batch(queries, k)
                STATS.incr("batched_queries", len(chunk))
                if len(chunk) > 1:
                    STATS.incr("query_batches_coalesced")
                for row, p in enumerate(chunk):
                    p.future.set_result((d[row], ids[row]))
            except Exception as exc:  # propagate to every waiter
                for p in chunk:
                    if not p.future.done():
                        p.future.set_exception(exc)


_GLOBAL = VectorQueryBatcher()


def submit(index, vector, k: int, ef: Optional[int] = None) -> Future:
    return _GLOBAL.submit(index, vector, k, ef)
