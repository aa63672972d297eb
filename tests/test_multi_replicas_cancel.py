"""MULTI/EXEC, replica read scaling, and query timeout/cancel tests.

Mirrors reference multi_exec_test.cc, FanoutTargetMode replica routing
(cluster_map.h:38-46), and cancel-token coverage (test_cancel.py)."""

import time

import numpy as np
import pytest

from valkey_search_tpu.cluster import ClusterEngine
from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.debug import CONTROLLED, reset_all
from valkey_search_tpu.server.engine import Engine
from valkey_search_tpu.utils.cancel import CancelledError, Token


@pytest.fixture(autouse=True)
def _clean():
    reset_all()
    yield
    reset_all()
    config.REGISTRY.reset_all()


# -- MULTI/EXEC --------------------------------------------------------------------

def test_multi_exec_sync():
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    tx = e.multi()
    tx.hset("k:1", {"t": "a"}).hset("k:2", {"t": "a"}).delete("k:1")
    assert e.execute("FT.SEARCH", "i", "@t:{a}", "NOCONTENT")[0] == 0  # not yet
    assert tx.exec() == 3
    r = e.execute("FT.SEARCH", "i", "@t:{a}", "NOCONTENT")
    assert r == [1, "k:2"]  # ordered: k:1 created then deleted


def test_multi_exec_async_ordered_no_combining():
    e = Engine(sync_ingest=False)
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    tx = e.multi()
    # same key three times: combining would collapse these; ordered queue
    # must apply all, last-writer state winning
    tx.hset("k:1", {"t": "first"})
    tx.hset("k:1", {"t": "second"})
    tx.hset("k:1", {"t": "third"})
    tx.exec()
    assert e.drain() is None or True
    e.drain()
    assert e.execute("FT.SEARCH", "i", "@t:{third}", "NOCONTENT") == [1, "k:1"]
    from valkey_search_tpu.runtime.metrics import STATS

    # all three went through the queue (no combine)
    assert STATS.get("mutations_applied") >= 3


def test_multi_discard():
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "SCHEMA", "t", "TAG")
    tx = e.multi()
    tx.hset("x", {"t": "a"})
    tx.discard()
    with pytest.raises(Exception):
        tx.exec()
    assert e.execute("FT.SEARCH", "i", "@t:{a}", "NOCONTENT")[0] == 0


def test_multi_exec_json():
    e = Engine()
    e.execute("FT.CREATE", "j", "ON", "JSON", "PREFIX", "1", "d:",
              "SCHEMA", "$.t", "AS", "t", "TAG")
    tx = e.multi()
    tx.json_set("d:1", "$", '{"t": "x"}')
    tx.exec()
    assert e.execute("FT.SEARCH", "j", "@t:{x}", "NOCONTENT") == [1, "d:1"]


# -- replicas ---------------------------------------------------------------------

@pytest.fixture()
def replicated(rng):
    c = ClusterEngine(n_nodes=2, replicas_per_shard=2)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    for i, v in enumerate(vecs):
        c.hset(f"doc:{i}", {"emb": v.tobytes(), "t": "x"})
    c.ft_create(
        "idx", "ON", "HASH", "PREFIX", "1", "doc:",
        "SCHEMA", "emb", "VECTOR", "FLAT", "6",
        "TYPE", "FLOAT32", "DIM", "8", "DISTANCE_METRIC", "L2",
        "t", "TAG",
    )
    return c, vecs


def test_replicas_hold_full_shard_state(replicated):
    c, vecs = replicated
    for i, primary in enumerate(c.nodes):
        for r in c.replicas[i]:
            assert len(r.engine.keyspace) == len(primary.engine.keyspace)
            assert r.engine.manager.get("idx").num_docs() == \
                primary.engine.manager.get("idx").num_docs()


def test_replica_only_fanout(replicated):
    c, vecs = replicated
    config.set_config("search.fanout-target-mode", "replica")
    q = vecs[9].tobytes()
    r = c.execute("FT.SEARCH", "idx", "*=>[KNN 3 @emb $q]",
                  "PARAMS", "2", "q", q, "NOCONTENT")
    assert r[1] == "doc:9"


def test_force_replicas_only_controlled_var(replicated):
    c, vecs = replicated
    CONTROLLED.set("force_replicas_only", "true")
    q = vecs[3].tobytes()
    r = c.execute("FT.SEARCH", "idx", "*=>[KNN 1 @emb $q]",
                  "PARAMS", "2", "q", q, "NOCONTENT")
    assert r[1] == "doc:3"


def test_replica_write_propagation(replicated):
    c, vecs = replicated
    nv = np.full(8, 0.25, np.float32)
    c.hset("doc:999", {"emb": nv.tobytes(), "t": "new"})
    config.set_config("search.fanout-target-mode", "replica")
    r = c.execute("FT.SEARCH", "idx", "@t:{new}", "NOCONTENT")
    assert r == [1, "doc:999"]
    c.delete("doc:999")
    assert c.execute("FT.SEARCH", "idx", "@t:{new}", "NOCONTENT")[0] == 0


# -- cancellation / timeout ----------------------------------------------------------

def test_token_deadline():
    t = Token(timeout_ms=1)
    time.sleep(0.01)
    assert t.expired()
    with pytest.raises(CancelledError):
        t.check()


def test_token_manual_cancel():
    t = Token(timeout_ms=None)
    assert not t.expired()
    t.cancel("client gone")
    with pytest.raises(CancelledError):
        t.check()


def test_search_timeout_param():
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    for i in range(50):
        e.hset(f"k:{i}", {"t": "a"})
    # TIMEOUT 0 → token already expired → CancelledError
    with pytest.raises(CancelledError):
        e.execute("FT.SEARCH", "i", "@t:{a}", "TIMEOUT", "0")
    # generous timeout works
    r = e.execute("FT.SEARCH", "i", "@t:{a}", "NOCONTENT", "TIMEOUT", "10000",
                  "LIMIT", "0", "100")
    assert r[0] == 50
