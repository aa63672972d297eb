"""Postings: one word's (doc -> ordered positions, per-position field mask).

Reference: src/indexes/text/posting.h — "an ordered list of Keys and for
each Key an ordered list of Positions; each position is tagged with a
bitmask of fields" (FieldMask, 64 fields max), with KeyIterator /
PositionIterator used by the streaming term/proximity iterators.

Here docs are dense int doc-ids (the schema KeyInterner space), so the
key list is a sorted dict and the per-doc position map is a plain
dict[pos -> mask]; iteration yields sorted views. Mask bits are the
per-schema text-field bits (TextEngine.fields)."""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

MAX_TEXT_FIELDS = 64  # reference FieldMask is uint64 (posting.h:52)


class Postings:
    __slots__ = ("_docs", "_position_count")

    def __init__(self):
        self._docs: Dict[int, Dict[int, int]] = {}  # doc -> {position -> field mask}
        self._position_count = 0

    def is_empty(self) -> bool:
        return not self._docs

    def key_count(self) -> int:
        return len(self._docs)

    def position_count(self) -> int:
        return self._position_count

    def add(self, doc: int, position: int, field_bit: int) -> None:
        pm = self._docs.setdefault(doc, {})
        prev = pm.get(position)
        if prev is None:
            pm[position] = field_bit
            self._position_count += 1
        else:
            pm[position] = prev | field_bit

    def remove_field(self, doc: int, field_bit: int) -> None:
        """Drop one field's positions for a doc (re-index of that field)."""
        pm = self._docs.get(doc)
        if pm is None:
            return
        dead = []
        for pos, mask in pm.items():
            mask &= ~field_bit
            if mask:
                pm[pos] = mask
            else:
                dead.append(pos)
        for pos in dead:
            del pm[pos]
            self._position_count -= 1
        if not pm:
            del self._docs[doc]

    def remove_doc(self, doc: int) -> None:
        pm = self._docs.pop(doc, None)
        if pm:
            self._position_count -= len(pm)

    def docs(self, field_mask: int = ~0) -> Iterator[int]:
        """Docs where this word appears in any field of field_mask
        (KeyIterator.ContainsFields, posting.h:118)."""
        for doc, pm in self._docs.items():
            for mask in pm.values():
                if mask & field_mask:
                    yield doc
                    break

    def contains(self, doc: int, field_mask: int = ~0) -> bool:
        pm = self._docs.get(doc)
        if pm is None:
            return False
        return any(mask & field_mask for mask in pm.values())

    def positions(self, doc: int, field_mask: int = ~0) -> List[int]:
        """Sorted positions of this word in doc restricted to field_mask."""
        pm = self._docs.get(doc)
        if pm is None:
            return []
        return sorted(p for p, m in pm.items() if m & field_mask)

    def items(self) -> Iterator[Tuple[int, Dict[int, int]]]:
        return iter(self._docs.items())
