"""Versioning drills: RDB min-compat gate + metadata wire version gate.

Mirrors /root/reference/integration/test_versioning.py:
 - CMD: SAVE under ``override_min_version`` (a controlled variable,
   index_schema.cc:2186) stamps a from-the-future min-compat version into
   the checkpoint header; reloading must fail with a clear error.
 - CME: an index created under the override produces metadata entries
   remote nodes refuse to interpret (metadata_manager.cc:401-409), so
   FT.CREATE errors "Unable to contact all cluster members" while the
   creating node still lists the index.
"""

import numpy as np
import pytest

from valkey_search_tpu.cluster import ClusterBus, ClusterEngine, MetadataManager
from valkey_search_tpu.cluster.metadata import (
    MODULE_VERSION,
    encode_version,
    min_version_for_payload,
)
from valkey_search_tpu.cluster.node import ConsistencyError
from valkey_search_tpu.persistence.checkpoint import load_engine, save_engine
from valkey_search_tpu.persistence.format import FormatError
from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.debug import CONTROLLED, reset_all
from valkey_search_tpu.runtime.metrics import STATS
from valkey_search_tpu.server.engine import Engine

FUTURE = 10 << 16  # the reference drill's value (major version 10)


@pytest.fixture(autouse=True)
def _clean():
    reset_all()
    yield
    reset_all()
    config.REGISTRY.reset_all()


def _engine_with_docs(n=20):
    e = Engine(sync_ingest=True)
    config.set_config("search.debug-mode", True)
    e.execute(
        "FT.CREATE", "hnsw", "SCHEMA",
        "v", "VECTOR", "HNSW", "10",
        "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2",
        "M", "2", "EF_CONSTRUCTION", "4",
        "n", "NUMERIC",
    )
    rng = np.random.default_rng(7)
    for i in range(n):
        e.hset(f"doc:{i}", {
            "v": rng.standard_normal(3).astype(np.float32).tobytes(),
            "n": str(i),
        })
    return e


# -- CMD: RDB min-version gate ------------------------------------------------

def test_save_under_override_min_version_fails_reload(tmp_path):
    e = _engine_with_docs()
    # driven through the same FT._DEBUG surface the reference test uses
    e.execute("FT._DEBUG", "CONTROLLED_VARIABLE", "SET",
              "override_min_version", str(FUTURE))
    path = str(tmp_path / "future.vstpu")
    save_engine(e, path)
    # the reload happens on a module *without* the override (a real older
    # binary): clear it before loading
    CONTROLLED.clear("override_min_version")
    with pytest.raises(FormatError, match="requires format"):
        load_engine(path)


def test_save_without_override_roundtrips(tmp_path):
    e = _engine_with_docs()
    path = str(tmp_path / "ok.vstpu")
    save_engine(e, path)
    e2 = load_engine(path)
    assert e2.execute("FT.SEARCH", "hnsw", "@n:[5 9]", "NOCONTENT")[0] == 5


def test_override_minus_one_means_no_override(tmp_path):
    e = _engine_with_docs(5)
    e.execute("FT._DEBUG", "CONTROLLED_VARIABLE", "SET",
              "override_min_version", "-1")
    path = str(tmp_path / "noop.vstpu")
    save_engine(e, path)
    CONTROLLED.clear("override_min_version")
    assert load_engine(path) is not None


# -- per-payload minimum versions ---------------------------------------------

def test_min_version_for_payload_tiers():
    assert min_version_for_payload(None) == encode_version(1, 0)
    base = {"db": 0, "attributes": [{"kind": "TAG"}]}
    assert min_version_for_payload(base) == encode_version(1, 0)
    assert min_version_for_payload({"db": 3, "attributes": []}) \
        == encode_version(1, 1)
    text = {"db": 0, "attributes": [{"kind": "TEXT"}]}
    assert min_version_for_payload(text) == encode_version(1, 2)
    assert min_version_for_payload(text) <= MODULE_VERSION
    CONTROLLED.set("override_min_version", str(FUTURE))
    assert min_version_for_payload(base) == FUTURE


# -- CME: metadata wire version gate ------------------------------------------

def test_gossip_ignores_future_metadata():
    bus = ClusterBus()
    a = MetadataManager("a", bus)
    b = MetadataManager("b", bus)
    CONTROLLED.set("override_min_version", str(FUTURE))
    rejected0 = STATS.get("metadata_version_rejected")
    a.create_entry("idx", {"db": 0, "attributes": []})
    # a has it; b refused the broadcast
    assert a.get("idx") is not None
    assert b.get("idx") is None
    assert STATS.get("metadata_version_rejected") > rejected0
    # clearing the override and re-creating restamps the entry at a
    # current version → now it propagates
    CONTROLLED.clear("override_min_version")
    a.create_entry("idx", {"db": 0, "attributes": []})
    assert b.get("idx") is not None


def test_reconcile_skips_future_entries_only():
    """A pulled map mixing current and future entries applies only the
    current ones (per-entry gate on the socket transport's pull path)."""
    a = MetadataManager("a", ClusterBus())  # isolated buses: no gossip
    b = MetadataManager("b", ClusterBus())
    a.create_entry("old", {"db": 0, "attributes": []})
    CONTROLLED.set("override_min_version", str(FUTURE))
    a.create_entry("new", {"db": 0, "attributes": []})
    CONTROLLED.clear("override_min_version")
    got = b.reconcile(a.get_global_metadata())
    assert got is True
    assert b.get("old") is not None
    assert b.get("new") is None


def test_cluster_ft_create_future_version_errors_but_lists_locally():
    c = ClusterEngine(n_nodes=3)
    for i in range(6):
        c.hset(f"doc:{i}", {"n": str(i)})
    CONTROLLED.set("override_min_version", str(FUTURE))
    with pytest.raises(ConsistencyError,
                       match="Unable to contact all cluster members"):
        c.ft_create("vidx", "ON", "HASH", "PREFIX", "1",
                    "doc:", "SCHEMA", "n", "NUMERIC", timeout_s=0.4)
    # the creating node keeps the index (reference: ft._list on the
    # origin shows it, peers show nothing)
    assert "vidx" in [str(x) for x in c.ft_list()]
    for node in c.nodes[1:]:
        assert node.metadata.get("vidx") is None
