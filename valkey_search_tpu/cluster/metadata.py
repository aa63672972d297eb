"""MetadataManager: versioned, fingerprinted index metadata with gossip.

Reference: src/coordinator/metadata_manager.{h,cc} — each node holds a
map of metadata entries (index definitions) tagged (version,
fingerprint); a keyed 64-bit highwayhash over the whole map is broadcast
on the cluster bus (metadata_manager.h:74-76); a node seeing an unknown
top-level fingerprint pulls GetGlobalMetadata from the sender and
reconciles per entry by last-writer-wins on (version, fingerprint)
(ReconcileMetadata, metadata_manager.h:138; docs/topics/search.md "Index
Consistency"). Losing nodes delete and recreate indexes; content is
rebuilt by backfill (§5.3 elastic recovery). Replicas receive entries
via the FT.INTERNAL_UPDATE replication command (ft_internal_update.cc).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import threading
from typing import Callable, Dict, List, Optional, Tuple

from valkey_search_tpu.runtime.debug import CONTROLLED
from valkey_search_tpu.runtime.metrics import STATS

_FP_KEY = b"valkey-search-tpu-metadata"  # stand-in for the highwayhash key


def fingerprint64(data: bytes) -> int:
    """Keyed 64-bit fingerprint (reference: highwayhash keyed 64-bit,
    metadata_manager.h:67-69). blake2b with a key, truncated to 64 bits."""
    h = hashlib.blake2b(data, digest_size=8, key=_FP_KEY)
    return int.from_bytes(h.digest(), "little")


@dataclasses.dataclass
class MetadataEntry:
    name: str
    version: int
    fingerprint: int
    payload: Optional[Dict]  # None == tombstone (dropped index)

    def encode(self) -> bytes:
        return json.dumps(
            {"name": self.name, "version": self.version,
             "payload": self.payload},
            sort_keys=True,
        ).encode()


def _entry_fingerprint(name: str, payload: Optional[Dict]) -> int:
    return fingerprint64(
        json.dumps({"name": name, "payload": payload}, sort_keys=True).encode()
    )


class ClusterBus:
    """In-process gossip/RPC hub connecting node callbacks by id."""

    def __init__(self):
        self._lock = threading.Lock()
        self._nodes: Dict[str, "MetadataManager"] = {}

    def join(self, manager: "MetadataManager") -> None:
        with self._lock:
            self._nodes[manager.node_id] = manager

    def leave(self, node_id: str) -> None:
        with self._lock:
            self._nodes.pop(node_id, None)

    def nodes(self) -> List[str]:
        with self._lock:
            return sorted(self._nodes)

    def peer(self, node_id: str) -> "MetadataManager":
        with self._lock:
            return self._nodes[node_id]

    def broadcast_fingerprint(self, sender: str, fingerprint: int) -> None:
        """Cluster-bus gossip: deliver the sender's top-level fingerprint
        to every other node (reference BroadcastMetadata)."""
        with self._lock:
            targets = [m for nid, m in self._nodes.items() if nid != sender]
        for m in targets:
            m.on_fingerprint(sender, fingerprint)


class MetadataManager:
    """Per-node metadata store + reconciliation."""

    def __init__(
        self,
        node_id: str,
        bus: ClusterBus,
        on_apply: Optional[Callable[[str, Optional[Dict]], None]] = None,
    ):
        self.node_id = node_id
        self.bus = bus
        self.on_apply = on_apply  # (name, payload-or-None) → create/drop
        self._lock = threading.RLock()
        self._entries: Dict[str, MetadataEntry] = {}
        bus.join(self)

    # -- local state ---------------------------------------------------------
    def entries(self) -> Dict[str, MetadataEntry]:
        with self._lock:
            return dict(self._entries)

    def get(self, name: str) -> Optional[MetadataEntry]:
        with self._lock:
            e = self._entries.get(name)
            return e if e is not None and e.payload is not None else None

    def top_fingerprint(self) -> int:
        """Fingerprint over the whole map (broadcast payload)."""
        if CONTROLLED.is_true("force_invalid_metadata_fingerprint"):
            return 0xBAD
        with self._lock:
            blob = b"|".join(
                e.encode() for _, e in sorted(self._entries.items())
            )
        return fingerprint64(blob)

    # -- mutation (the FT.CREATE/FT.DROPINDEX path) ----------------------------
    def create_entry(self, name: str, payload: Dict) -> MetadataEntry:
        with self._lock:
            prev = self._entries.get(name)
            version = (prev.version + 1) if prev is not None else 1
            entry = MetadataEntry(
                name, version, _entry_fingerprint(name, payload), payload
            )
            self._entries[name] = entry
            self._apply_local(entry)
        self.broadcast()
        return entry

    def drop_entry(self, name: str) -> None:
        with self._lock:
            prev = self._entries.get(name)
            version = (prev.version + 1) if prev is not None else 1
            entry = MetadataEntry(
                name, version, _entry_fingerprint(name, None), None
            )
            self._entries[name] = entry
            self._apply_local(entry)
        self.broadcast()

    def _apply_local(self, entry: MetadataEntry) -> None:
        if self.on_apply is not None:
            self.on_apply(entry.name, entry.payload)

    # -- gossip / reconcile -----------------------------------------------------
    def broadcast(self) -> None:
        STATS.incr("metadata_broadcasts")
        self.bus.broadcast_fingerprint(self.node_id, self.top_fingerprint())

    def on_fingerprint(self, sender: str, fingerprint: int) -> None:
        if fingerprint == self.top_fingerprint():
            return
        try:
            remote = self.bus.peer(sender).get_global_metadata()
        except KeyError:
            return
        changed = self.reconcile(remote)
        if changed:
            # converged state may still be unknown to others; re-gossip
            self.broadcast()

    def get_global_metadata(self) -> Dict[str, MetadataEntry]:
        """The GetGlobalMetadata RPC (coordinator.proto:22)."""
        with self._lock:
            return {
                n: MetadataEntry(e.name, e.version, e.fingerprint,
                                 None if e.payload is None else dict(e.payload))
                for n, e in self._entries.items()
            }

    def reconcile(self, remote: Dict[str, MetadataEntry]) -> bool:
        """Per-entry last-writer-wins on (version, fingerprint)
        (reference ReconcileMetadata, metadata_manager.h:138). Ties on
        version break on the larger fingerprint so all nodes converge to
        the same winner deterministically."""
        changed = False
        to_apply: List[MetadataEntry] = []
        with self._lock:
            for name, r in remote.items():
                mine = self._entries.get(name)
                if mine is not None and (mine.version, mine.fingerprint) >= (
                    r.version, r.fingerprint
                ):
                    continue
                self._entries[name] = r
                to_apply.append(r)
                changed = True
        for e in to_apply:
            self._apply_local(e)
        if changed:
            STATS.incr("metadata_reconciles")
        return changed

    # -- replication (FT.INTERNAL_UPDATE path) -----------------------------------
    def internal_update(self, raw: bytes, skip_corrupted: bool = False) -> bool:
        """Apply one replicated entry (reference ft_internal_update.cc:55;
        skip-corrupted-internal-update-entries config gates bad entries)."""
        try:
            d = json.loads(raw)
            entry = MetadataEntry(
                d["name"], int(d["version"]),
                _entry_fingerprint(d["name"], d["payload"]), d["payload"],
            )
        except Exception:
            STATS.incr("internal_update_corrupted")
            if skip_corrupted:
                return False
            raise
        return self.reconcile({entry.name: entry})
