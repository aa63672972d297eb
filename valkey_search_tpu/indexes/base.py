"""Abstract index interface.

Models reference src/indexes/index_base.h:55-98 (`indexes::IndexBase`:
AddRecord / RemoveRecord / ModifyRecord, tracked/untracked key sets, save,
mutation weight) and the EntriesFetcherBase iterator protocol
(index_base.h:100-113) used by the query planner to size and scan
predicates.
"""

from __future__ import annotations

import enum
from typing import Iterable, Iterator, Optional, Set


class RecordResult(enum.Enum):
    # Mirrors indexes::IndexBase::RecordResult (index_base.h:38-47).
    ADDED = "added"
    MODIFIED = "modified"
    REMOVED = "removed"
    SKIPPED = "skipped"      # e.g. value unchanged / key untracked
    INVALID_DATA = "invalid"  # bad value → key must leave all indexes
                              # (Redisearch compat: index_schema.cc:729)


_SET_ENTRY_BYTES = 32   # rough CPython set-slot cost per int element
_DICT_ENTRY_BYTES = 72  # rough CPython dict-entry cost (key+value+slot)


class EntriesFetcher:
    """Iterator over the internal ids matching one predicate leaf.

    Reference EntriesFetcherBase (index_base.h:100-113): Size() lets the
    planner estimate selectivity (numeric btree O(log n) range count,
    tag rax posting size, text prefix count) before deciding pre-filter vs
    inline-filter; the iterator yields qualified ids for the pre-filter path.
    """

    def __init__(self, ids: Iterable[int], size: Optional[int] = None):
        self._ids = ids
        self._size = size

    def size(self) -> int:
        if self._size is not None:
            return self._size
        self._ids = list(self._ids)
        self._size = len(self._ids)
        return self._size

    def __iter__(self) -> Iterator[int]:
        return iter(self._ids)


class IndexBase:
    """Base index: per-attribute add/remove/modify over interned keys."""

    #: relative cost weight for the ingestion scheduler (reference
    #: index_base.h GetMutationWeight; vectors are the heavy ones).
    mutation_weight: float = 1.0

    def add_record(self, key: str, value) -> RecordResult:
        raise NotImplementedError

    def modify_record(self, key: str, value) -> RecordResult:
        raise NotImplementedError

    def remove_record(self, key: str) -> RecordResult:
        raise NotImplementedError

    def tracked_keys(self) -> Set[str]:
        raise NotImplementedError

    def memory_bytes(self) -> int:
        """Rough resident bytes of this index's host structures (the
        engine's DENYOOM accounting — reference counts every module byte
        through malloc interposition, memory_allocation_overrides.h;
        here each structure self-reports an estimate)."""
        return 0

    def tracks(self, key: str) -> bool:
        """O(1) membership (hot write path: tracked_keys() copies)."""
        return key in self.tracked_keys()

    def count(self) -> int:
        raise NotImplementedError
