"""RDB load recovery paths: skip-index-load config + load-error cleanup.

Mirrors /root/reference/integration/test_skip_index_load.py (the
rdb_load_skip_index config lets a server start from an RDB whose index
payloads are unusable, recreating schemas empty and rebuilding by
backfill, index_schema.cc:1698), test_rdb_load_error_cleanup.py (a failed
load must not leak half-created indexes) and
test_number_of_indexes_on_restore.py (FT._LIST count survives restore).
"""

import struct

import numpy as np
import pytest

from valkey_search_tpu.persistence.checkpoint import (
    CheckpointError,
    load_engine,
    save_engine,
)
from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.debug import reset_all
from valkey_search_tpu.runtime.metrics import STATS
from valkey_search_tpu.server.engine import Engine


@pytest.fixture(autouse=True)
def _clean():
    reset_all()
    yield
    reset_all()
    config.REGISTRY.reset_all()


def _mk_engine(n=30, n_indexes=1):
    e = Engine(sync_ingest=True)
    for j in range(n_indexes):
        e.execute(
            "FT.CREATE", f"idx{j}", "ON", "HASH", "PREFIX", "1", f"d{j}:",
            "SCHEMA", "v", "VECTOR", "HNSW", "6",
            "TYPE", "FLOAT32", "DIM", "4", "DISTANCE_METRIC", "L2",
            "n", "NUMERIC",
        )
    rng = np.random.default_rng(11)
    for j in range(n_indexes):
        for i in range(n):
            e.hset(f"d{j}:{i}", {
                "v": rng.standard_normal(4).astype(np.float32).tobytes(),
                "n": str(i),
            })
    return e


def test_skip_rdb_load_config_rebuilds_from_keyspace(tmp_path):
    e = _mk_engine()
    path = str(tmp_path / "c.vstpu")
    save_engine(e, path)
    config.set_config("search.skip-rdb-load", True)
    e2 = Engine.load(path)  # config consulted, no explicit flag
    assert e2.execute("FT.SEARCH", "idx0", "@n:[0 9]", "NOCONTENT")[0] == 10
    q = np.zeros(4, np.float32).tobytes()
    r = e2.execute("FT.SEARCH", "idx0", "*=>[KNN 5 @v $q]",
                   "PARAMS", "2", "q", q, "NOCONTENT")
    assert r[0] == 5


def test_number_of_indexes_on_restore(tmp_path):
    e = _mk_engine(n=5, n_indexes=4)
    path = str(tmp_path / "multi.vstpu")
    save_engine(e, path)
    for skip in (False, True):
        config.set_config("search.skip-rdb-load", skip)
        e2 = Engine.load(path)
        assert sorted(str(x) for x in e2.ft_list()) == \
            ["idx0", "idx1", "idx2", "idx3"]


def test_truncated_file_fails_cleanly(tmp_path):
    e = _mk_engine(n=10)
    path = str(tmp_path / "t.vstpu")
    save_engine(e, path)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    fails0 = STATS.get("rdb_load_failures")
    target = Engine()
    with pytest.raises(Exception):
        load_engine(path, engine=target)
    assert STATS.get("rdb_load_failures") == fails0 + 1
    # no half-created index leaked: the name is free for FT.CREATE
    assert target.ft_list() == []
    target.execute("FT.CREATE", "idx0", "SCHEMA", "n", "NUMERIC")
    assert [str(x) for x in target.ft_list()] == ["idx0"]


def test_corrupt_schema_definition_unwinds_created_schemas(tmp_path):
    """Failure while registering the *second* schema must also unregister
    the first (the reference cleans up every index the failed load
    produced)."""
    e = _mk_engine(n=4, n_indexes=2)
    path = str(tmp_path / "u.vstpu")
    save_engine(e, path)
    data = bytearray(open(path, "rb").read())
    # corrupt idx1's schema definition json: break its "kind" token so
    # _build_schema raises after idx0 was already registered
    needle = data.find(b'"name": "idx1"')
    assert needle != -1
    kind = data.find(b'"kind"', needle)
    if kind != -1:
        data[kind + 1 : kind + 5] = b"kinq"
    open(path, "wb").write(bytes(data))
    target = Engine()
    with pytest.raises(Exception):
        load_engine(path, engine=target)
    assert target.ft_list() == []


def test_hnsw_add_after_reload_with_tombstones(tmp_path, rng):
    """Reference test_hnsw_allow_replace_deleted: delete vectors, save,
    reload, then ADD into the reloaded graph containing tombstones —
    inserts must succeed and searches stay correct (the hnswlib
    replace-deleted path had a reload bug; the rebuild/vacuum design here
    must honor the same contract)."""
    import numpy as np

    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    e.execute("FT.CREATE", "rz", "ON", "HASH", "PREFIX", "1", "rdoc:",
              "SCHEMA", "v", "VECTOR", "HNSW", "6",
              "TYPE", "FLOAT32", "DIM", "4", "DISTANCE_METRIC", "L2")
    vecs = {}
    for i in range(10):
        v = np.asarray([float(i) + 0.1 * d for d in range(4)], np.float32)
        vecs[i] = v
        e.execute("HSET", f"rdoc:{i}", "v", v.tobytes())
    for i in (8, 9):
        e.execute("DEL", f"rdoc:{i}")
    path = str(tmp_path / "tomb.vstpu")
    e.save(path)
    r = Engine.load(path)
    # tombstoned keys stay gone after reload
    out = r.execute("FT.SEARCH", "rz", "*", "NOCONTENT", "LIMIT", "0", "20")
    assert int(out[0]) == 8 and "rdoc:8" not in out[1:]
    # adds into the reloaded (tombstone-bearing) graph work
    for i in range(10, 14):
        v = np.asarray([float(i) + 0.1 * d for d in range(4)], np.float32)
        vecs[i] = v
        r.execute("HSET", f"rdoc:{i}", "v", v.tobytes())
    out = r.execute("FT.SEARCH", "rz", "*", "NOCONTENT", "LIMIT", "0", "20")
    assert int(out[0]) == 12
    # nearest-neighbor of a fresh vector is itself
    q = vecs[12]
    out = r.execute("FT.SEARCH", "rz", "*=>[KNN 1 @v $q]",
                    "PARAMS", "2", "q", q.tobytes(), "NOCONTENT")
    assert out[1] == "rdoc:12"
    # and a re-added previously-deleted key serves again
    r.execute("HSET", "rdoc:8", "v", vecs[8].tobytes())
    out = r.execute("FT.SEARCH", "rz", "*=>[KNN 1 @v $q]",
                    "PARAMS", "2", "q", vecs[8].tobytes(), "NOCONTENT")
    assert out[1] == "rdoc:8"
