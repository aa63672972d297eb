"""SchemaManager: per-db index registry + backfill driver.

Reference: src/schema_manager.{h,cc} — singleton owning name→IndexSchema
per db (schema_manager.h:43-124), create/drop (locally or through the
cluster MetadataManager), and the cron-driven backfill
(PerformBackfill, schema_manager.cc:621).
"""

from __future__ import annotations

import threading
from typing import Dict, Iterable, List, Optional, Tuple

from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.metrics import STATS
from valkey_search_tpu.schema.index_schema import IndexSchema


class SchemaError(ValueError):
    pass


class SchemaManager:
    def __init__(self):
        from valkey_search_tpu.utils.patricia import PatriciaTree

        self._schemas: Dict[Tuple[int, str], IndexSchema] = {}
        self._subscriptions = PatriciaTree()  # prefix → schemas
        self._lock = threading.RLock()

    def create(self, schema: IndexSchema) -> IndexSchema:
        with self._lock:
            key = (schema.db, schema.name)
            if key in self._schemas:
                raise SchemaError(f"Index {schema.name} already exists")
            if len(self._schemas) >= int(config.get("search.max-indexes")):
                raise SchemaError("too many indexes")
            self._schemas[key] = schema
            for p in schema.prefixes:
                self._subscriptions.insert(p, schema)
            STATS.incr("indexes_created")
            return schema

    def get(self, name: str, db: int = 0) -> IndexSchema:
        with self._lock:
            s = self._schemas.get((db, name))
            if s is None:
                raise SchemaError(f"Index with name '{name}' not found")
            return s

    def drop(self, name: str, db: int = 0) -> None:
        with self._lock:
            if (db, name) not in self._schemas:
                raise SchemaError(f"Index with name '{name}' not found")
            schema = self._schemas.pop((db, name))
            for p in schema.prefixes:
                self._subscriptions.remove(p, schema)
            STATS.incr("indexes_dropped")

    def list_names(self, db: int = 0) -> List[str]:
        with self._lock:
            return sorted(n for (d, n) in self._schemas if d == db)

    def all_schemas(self) -> List[IndexSchema]:
        with self._lock:
            return list(self._schemas.values())

    def subscribed(self, key: str, db: int = 0) -> Iterable[IndexSchema]:
        """Schemas whose prefix set matches the key — O(len(key)) patricia
        dispatch (reference KeyspaceEventManager + PatriciaTree,
        keyspace_event_manager.h:52, utils/patricia_tree.h). Dedup because
        a schema may own several covering prefixes."""
        with self._lock:
            seen = set()
            out = []
            for s in self._subscriptions.match(key):
                if id(s) not in seen and s.db == db:
                    seen.add(id(s))
                    out.append(s)
            return out

    def backfill(
        self,
        schema: IndexSchema,
        keyspace: Dict[str, Dict[str, object]],
        batch_size: Optional[int] = None,
    ) -> int:
        """Scan existing keys into a fresh index (reference
        IndexSchema::PerformBackfill, index_schema.cc:1044 — cursor batches
        through the db on server cron, low priority)."""
        batch_size = batch_size or int(config.get("search.backfill-batch-size"))
        schema.backfill_in_progress = True
        n = 0
        try:
            from valkey_search_tpu.runtime.debug import PAUSEPOINTS

            for key, fields in list(keyspace.items()):
                if not schema.matches_key(key):
                    continue
                if n % batch_size == 0:
                    PAUSEPOINTS.test("backfill.batch")
                schema.upsert(key, fields)
                n += 1
                schema.backfill_scanned = n
        finally:
            schema.backfill_in_progress = False
        STATS.incr("backfilled_records", n)
        return n

    def backfill_batch(
        self,
        schema: IndexSchema,
        keyspace: Dict[str, Dict[str, object]],
        batch_size: Optional[int] = None,
        ingestion=None,
        fetch=None,
    ) -> int:
        """Advance one cursor-batched backfill step (reference
        SchemaManager::PerformBackfill driven from server cron,
        schema_manager.cc:621: scan-cursor batches, low priority, pauses
        while OOM). Returns keys processed this step; 0 when complete.
        The scan snapshot is the key list at cron time — keys written
        after a cursor passes them are covered by keyspace notifications,
        exactly like the reference's scan semantics."""
        if getattr(schema, "paused_by_oom", False):
            return 0  # backfill pauses under memory pressure
        batch_size = batch_size or int(config.get("search.backfill-batch-size"))
        from valkey_search_tpu.runtime.debug import PAUSEPOINTS

        PAUSEPOINTS.test("backfill.batch")
        keys = sorted(k for k in keyspace if schema.matches_key(k))
        cursor = getattr(schema, "backfill_cursor", 0)
        chunk = keys[cursor : cursor + batch_size]
        if not chunk:
            if ingestion is not None and getattr(
                schema, "backfill_outstanding", 0
            ) > 0:
                # every key is enqueued but some are still applying:
                # completion (percent_indexed=100) must mean APPLIED,
                # not merely queued (r3 review finding) — stay
                # in-progress until the on_done callbacks settle
                return 0
            schema.backfill_in_progress = False
            schema.backfill_cursor = 0
            return 0
        schema.backfill_in_progress = True
        if ingestion is not None:
            # writer pool at LOW priority (reference index_schema.cc:994
            # from_backfill → kLow): live writes overtake a bulk backfill
            # under the weighted scheduler. Mutations are REFRESHES — the
            # worker fetches CURRENT fields at apply time (a snapshot
            # value could resurrect a concurrently-deleted key), and a
            # key with any pending mutation is skipped outright.
            if fetch is None:
                fetch = lambda key: keyspace.get(key)  # noqa: E731
            if not hasattr(schema, "_backfill_ctr_lock"):
                import threading as _threading

                schema._backfill_ctr_lock = _threading.Lock()
                schema.backfill_outstanding = 0

            def _done(s=schema):
                with s._backfill_ctr_lock:
                    s.backfill_outstanding -= 1

            for key in chunk:
                if keyspace.get(key) is None:
                    continue
                with schema._backfill_ctr_lock:
                    schema.backfill_outstanding = getattr(
                        schema, "backfill_outstanding", 0
                    ) + 1
                ingestion.enqueue_refresh(
                    schema, key, fetch, on_done=_done, priority="low"
                )
        else:
            for key in chunk:
                fields = keyspace.get(key)
                if fields is not None:
                    schema.upsert(key, fields)
        schema.backfill_cursor = cursor + len(chunk)
        schema.backfill_scanned = schema.backfill_cursor
        if schema.backfill_cursor >= len(keys):
            if ingestion is not None and getattr(
                schema, "backfill_outstanding", 0
            ) > 0:
                # cursor done but refreshes still queued/applying: a
                # later cron tick (empty-chunk path) finalizes once the
                # outstanding gauge settles
                pass
            else:
                schema.backfill_in_progress = False
                schema.backfill_cursor = 0
        STATS.incr("backfilled_records", len(chunk))
        return len(chunk)


MANAGER = SchemaManager()
