"""Ingestion pipeline: mutation queue + writer pool.

Reference: the keyspace-notification → mutation-queue → writer-thread-pool
path (src/index_schema.cc): TrackMutatedRecord (:1986) upserts into a
per-key queue *combining* consecutive mutations of the same key (only the
latest value matters), ScheduleMutation (:855) hands batches to the writer
pool (valkey_search.cc:1165-1168), ProcessSingleMutationAsync (:999)
applies under the write time-slice, and completion re-dispatches parked
queries.

TPU design: the same per-key combine queue feeds a small host writer pool;
"apply" routes to the host-side index structures (native HNSW builder,
postings, columns), and device snapshots publish lazily on the next query
(epoch double-buffering instead of the time-sliced MRMW mutex). Because a
query always runs on a published snapshot plus host-side content
re-verification (server.ft_search.resolve_content), the reference's
sequence-number contention check degenerates to ``drain()`` for strict
read-your-writes.
"""

from __future__ import annotations

import dataclasses
import threading
from collections import OrderedDict
from typing import Dict, Optional, Tuple

from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.metrics import STATS


@dataclasses.dataclass
class Mutation:
    schema: object
    key: str
    fields: Optional[Dict[str, object]]  # None → delete
    seq: int = 0


class IngestionEngine:
    """Per-key combining mutation queue drained by writer threads."""

    def __init__(self, num_workers: Optional[int] = None):
        self._queue: "OrderedDict[Tuple[int, str], Mutation]" = OrderedDict()
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._inflight = 0
        self._inflight_keys: set = set()
        self._seq = 0
        self._stop = False
        n = num_workers or int(config.get("search.writer-threads"))
        self._workers = [
            threading.Thread(target=self._run, name=f"vstpu-writer-{i}",
                             daemon=True)
            for i in range(n)
        ]
        for w in self._workers:
            w.start()

    # -- producer side -------------------------------------------------------
    def enqueue_upsert(self, schema, key: str, fields: Dict[str, object]) -> None:
        self._enqueue(Mutation(schema, key, dict(fields)))

    def enqueue_delete(self, schema, key: str) -> None:
        self._enqueue(Mutation(schema, key, None))

    def _enqueue(self, m: Mutation) -> None:
        with self._cv:
            self._seq += 1
            m.seq = self._seq
            qk = (id(m.schema), m.key)
            if qk in self._queue:
                # combine: replace the pending mutation for this key
                # (reference TrackMutatedRecord combine, index_schema.cc:1986)
                self._queue[qk] = m
                STATS.incr("mutations_combined")
            else:
                self._queue[qk] = m
            STATS.incr("mutations_enqueued")
            self._cv.notify()

    def enqueue_multi(self, muts) -> None:
        """Ordered group enqueue, exempt from per-key combining (reference
        EnqueueMultiMutation, index_schema.cc:834: MULTI/EXEC mutations keep
        their order and never merge with other pending writes)."""
        with self._cv:
            for m in muts:
                self._seq += 1
                m.seq = self._seq
                # unique queue key → no combining, FIFO order preserved
                self._queue[(id(m.schema), m.key, m.seq)] = m
                STATS.incr("mutations_enqueued")
            self._cv.notify_all()

    # -- worker side ---------------------------------------------------------
    def _run(self) -> None:
        from valkey_search_tpu.runtime.debug import PAUSEPOINTS

        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop and not self._queue:
                    return
            # reference-named gate that holds mutations IN the queue
            # (ft_debug.cc block_mutation_queue: integration tests freeze
            # the queue to probe in-flight revalidation, test_postfilter.py)
            PAUSEPOINTS.test("block_mutation_queue")
            with self._cv:
                if not self._queue:
                    continue  # drained (e.g. shutdown) while gated
                _, m = self._queue.popitem(last=False)
                self._inflight += 1
                self._inflight_keys.add((id(m.schema), m.key))
            # BACKGROUND_PAUSEPOINT equivalent (reference search.cc:435,657:
            # writer-path marks integration tests freeze on)
            from valkey_search_tpu.runtime.debug import PAUSEPOINTS

            PAUSEPOINTS.test("ingest.before_apply")
            # reference-named processing gate: the mutation is dequeued and
            # tracked in-flight but not yet applied — text queries whose
            # result keys hit this state park until it clears
            # (integration/test_fulltext_inflight_blocking.py)
            PAUSEPOINTS.test("mutation_processing")
            try:
                if m.fields is None:
                    m.schema.delete(m.key)
                else:
                    m.schema.upsert(m.key, m.fields)
                STATS.incr("mutations_applied")
            except Exception:
                STATS.incr("mutation_failures")
            finally:
                with self._cv:
                    self._inflight -= 1
                    self._inflight_keys.discard((id(m.schema), m.key))
                    self._cv.notify_all()

    # -- synchronization -----------------------------------------------------
    def pending(self) -> int:
        with self._lock:
            return len(self._queue) + self._inflight

    def pending_for_key(self, schema, key: str) -> bool:
        """In-flight-mutation check for a result key (the reference parks
        contended queries on the mutation's completion,
        PerformKeyContentionCheck, index_schema.cc:1917)."""
        with self._lock:
            return self._pending_for_key_locked(schema, key)

    def _pending_for_key_locked(self, schema, key: str) -> bool:
        if (id(schema), key) in self._queue:
            return True
        if (id(schema), key) in self._inflight_keys:
            return True
        return any(
            qk[0] == id(schema) and qk[1] == key
            for qk in self._queue if len(qk) == 3
        )

    def wait_for_key(self, schema, key: str, timeout: float) -> bool:
        """Park until the key's in-flight mutation completes (the analog of
        the reference re-dispatching a contended query from the mutation's
        waiting_queries list on completion). Returns True if it cleared."""
        with self._cv:
            return self._cv.wait_for(
                lambda: not self._pending_for_key_locked(schema, key),
                timeout,
            )

    def drain(self, timeout: Optional[float] = None) -> bool:
        with self._cv:
            return self._cv.wait_for(
                lambda: not self._queue and self._inflight == 0, timeout
            )

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        for w in self._workers:
            w.join(timeout=5)
