"""LRU, patricia dispatch, logging, vector externalizer tests
(reference src/utils/lru.h, patricia_tree.h, vmsdk log.h,
vector_externalizer.{h,cc})."""

import numpy as np
import pytest

from valkey_search_tpu.runtime import config
from valkey_search_tpu.server.engine import Engine
from valkey_search_tpu.utils.lru import LRU
from valkey_search_tpu.utils.patricia import PatriciaTree


@pytest.fixture(autouse=True)
def _reset():
    yield
    config.REGISTRY.reset_all()


def test_lru_eviction_order():
    c = LRU(3)
    for i in range(3):
        c.put(i, str(i))
    assert c.get(0) == "0"  # refresh 0
    c.put(3, "3")           # evicts 1 (least recent)
    assert c.get(1) is None
    assert c.get(0) == "0" and c.get(3) == "3"
    assert len(c) == 3
    assert c.hits >= 3 and c.misses >= 1


def test_patricia_prefix_dispatch():
    t = PatriciaTree()
    t.insert("doc:", "A")
    t.insert("doc:img:", "B")
    t.insert("", "ALL")
    t.insert("user", "U")
    assert set(t.match("doc:img:42")) == {"A", "B", "ALL"}
    assert set(t.match("doc:5")) == {"A", "ALL"}
    assert set(t.match("users:9")) == {"U", "ALL"}
    assert set(t.match("zzz")) == {"ALL"}
    t.remove("doc:", "A")
    assert set(t.match("doc:5")) == {"ALL"}


def test_schema_manager_patricia_routing():
    e = Engine()
    e.execute("FT.CREATE", "a", "ON", "HASH", "PREFIX", "1", "doc:",
              "SCHEMA", "t", "TAG")
    e.execute("FT.CREATE", "b", "ON", "HASH", "PREFIX", "2", "doc:", "img:",
              "SCHEMA", "t", "TAG")
    subs = e.manager.subscribed("doc:1")
    assert {s.name for s in subs} == {"a", "b"}
    assert {s.name for s in e.manager.subscribed("img:1")} == {"b"}
    assert e.manager.subscribed("other:1") == []
    e.execute("FT.DROPINDEX", "b")
    assert {s.name for s in e.manager.subscribed("doc:1")} == {"a"}


def test_log_rate_limit_and_redaction(caplog):
    import logging

    from valkey_search_tpu.runtime import log as L

    config.set_config("search.log-level", "debug")
    with caplog.at_level(logging.DEBUG, logger="valkey_search_tpu"):
        for _ in range(5):
            L.log_every_n_sec("notice", "k1", 60.0, "spam %s", "x")
    assert sum("spam" in r.message for r in caplog.records) == 1
    assert L.redact("secret-key").startswith("<redacted:")
    config.set_config("search.log-user-data", True)
    assert L.redact("secret-key") == "secret-key"


def test_return_vector_served_from_index(rng):
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "emb", "VECTOR", "FLAT", "6",
              "TYPE", "FLOAT32", "DIM", "8", "DISTANCE_METRIC", "COSINE",
              "n", "NUMERIC")
    vecs = rng.standard_normal((5, 8)).astype(np.float32)
    for i, v in enumerate(vecs):
        e.hset(f"k:{i}", {"emb": v.tobytes(), "n": str(i)})
    from valkey_search_tpu.runtime.metrics import STATS

    before = STATS.get("vectors_externalized")
    r = e.execute("FT.SEARCH", "i", "*=>[KNN 2 @emb $q]",
                  "PARAMS", "2", "q", vecs[3].tobytes(),
                  "RETURN", "2", "emb", "n")
    assert r[1] == "k:3"
    fields = dict(zip(r[2][::2], r[2][1::2]))
    # cosine store denormalizes back to the ORIGINAL bytes
    got = np.frombuffer(fields["emb"], np.float32)
    assert np.allclose(got, vecs[3], atol=1e-5)
    assert float(fields["n"]) == 3.0
    assert STATS.get("vectors_externalized") > before
