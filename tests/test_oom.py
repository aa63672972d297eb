"""Memory-cap handling: DENYOOM writes + backfill pause flag.

Mirrors reference OOM coverage (DENYOOM command flag module_loader.cc:47,
paused_by_oom index_schema.h:475, integration test_oom_handling.py)."""

import numpy as np
import pytest

from valkey_search_tpu.runtime import config
from valkey_search_tpu.server.engine import Engine, OutOfMemoryError


@pytest.fixture(autouse=True)
def _reset():
    yield
    config.REGISTRY.reset_all()


def test_writes_denied_above_cap():
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    e.hset("k:1", {"t": "a" * 100})
    used = e.used_memory_bytes()
    assert used > 0
    config.set_config("search.max-memory-bytes", max(1, used - 1))
    with pytest.raises(OutOfMemoryError):
        e.hset("k:2", {"t": "b"})
    with pytest.raises(OutOfMemoryError):
        e.json_set("k:3", "$", '{"t": "c"}')
    # backfill marked paused
    schema = e.manager.get("i")
    assert schema.paused_by_oom
    # reads still work
    assert e.execute("FT.SEARCH", "i", "@t:{" + "a" * 100 + "}", "NOCONTENT")[0] == 1
    # deletes still work and free memory
    e.delete("k:1")
    config.set_config("search.max-memory-bytes", 10_000_000)
    e.hset("k:2", {"t": "b"})  # under the cap again
    assert not schema.paused_by_oom
    from valkey_search_tpu.runtime.metrics import STATS

    assert STATS.get("oom_rejections") >= 2


def test_vector_bytes_counted():
    e = Engine()
    e.execute("FT.CREATE", "v", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "emb", "VECTOR", "FLAT", "6",
              "TYPE", "FLOAT32", "DIM", "64", "DISTANCE_METRIC", "L2")
    base = e.used_memory_bytes()
    e.hset("k:1", {"emb": np.zeros(64, np.float32).tobytes()})
    assert e.used_memory_bytes() > base


def test_unlimited_by_default():
    e = Engine()
    assert int(config.get("search.max-memory-bytes")) == 0
    e.hset("x", {"f": "v"})  # no cap, no error


def test_text_dominated_memory_counted():
    """Round-1 gap: text postings/trees were invisible to the OOM gauge.
    A text-heavy corpus must move the gauge and trip DENYOOM."""
    e = Engine()
    e.execute("FT.CREATE", "txt", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "body", "TEXT")
    base = e.used_memory_bytes()
    for i in range(300):
        e.hset(f"k:{i}", {"body": " ".join(f"word{i}x{j}" for j in range(30))})
    used = e.used_memory_bytes()
    pools = e.memory_pools()
    assert pools["text"] > 0
    # text must dominate this workload's growth
    assert pools["text"] > (used - base) * 0.3
    config.set_config("search.max-memory-bytes", max(1, used - 1))
    with pytest.raises(OutOfMemoryError):
        e.hset("k:new", {"body": "straw camel back"})
    schema = e.manager.get("txt")
    assert schema.paused_by_oom
    # OOM pause releases after the cap is raised (pause/resume cycle)
    config.set_config("search.max-memory-bytes", used * 10)
    e.hset("k:new", {"body": "fits again"})
    assert not schema.paused_by_oom


def test_memory_pools_in_info():
    e = Engine()
    e.execute("FT.CREATE", "p", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG", "n", "NUMERIC")
    e.hset("k:1", {"t": "x,y", "n": "4"})
    info = e.info(include_dev=True)
    # INFO renders SI-bytes strings ("426B", "1.2KiB"); presence + raw
    # pool values are the contract
    for pool in ("vector", "tag", "numeric", "text", "interner",
                 "keyspace"):
        assert f"search_memory_pool_{pool}_bytes" in info
    pools = e.memory_pools()
    assert pools["tag"] > 0 and pools["numeric"] > 0
    assert pools["keyspace"] > 0
    assert e.used_memory_bytes() == sum(pools.values())


def test_allkeys_random_eviction_removes_from_indexes():
    """maxmemory-policy allkeys-random: at the cap, writes evict keys
    instead of failing, and evicted keys leave every index (reference
    integration/test_eviction.py)."""
    e = Engine()
    e.execute("FT.CREATE", "ev", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG", "n", "NUMERIC")
    for i in range(200):
        e.hset(f"k:{i}", {"t": "x" * 50, "n": str(i)})
    used = e.used_memory_bytes()
    config.set_config("search.maxmemory-policy", "allkeys-random")
    config.set_config("search.max-memory-bytes", int(used * 0.8))
    before = len(e.keyspace)
    e.hset("k:new", {"t": "fits", "n": "1"})  # triggers eviction, no raise
    assert len(e.keyspace) < before
    from valkey_search_tpu.runtime.metrics import STATS

    assert STATS.get("keys_evicted") > 0
    # index consistency: every search result still exists in the keyspace
    r = e.execute("FT.SEARCH", "ev", "@n:[0 1000]", "NOCONTENT",
                  "LIMIT", "0", "500")
    keys = [k.decode() if isinstance(k, bytes) else k for k in r[1:]]
    for k in keys:
        assert e.hgetall(k), k
    # total reflects evictions
    assert r[0] <= len(e.keyspace)


def test_volatile_ttl_eviction_prefers_expiring_keys():
    e = Engine()
    e.execute("FT.CREATE", "vt", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    for i in range(100):
        e.hset(f"k:{i}", {"t": "y" * 80})
    # only the first 30 carry TTLs
    for i in range(30):
        e.expire(f"k:{i}", 10_000 + i)
    used = e.used_memory_bytes()
    config.set_config("search.maxmemory-policy", "volatile-ttl")
    config.set_config("search.max-memory-bytes", int(used * 0.95))
    e.hset("k:new", {"t": "z"})
    # evicted keys must come from the TTL'd set (soonest first)
    assert "k:0" not in e.keyspace
    assert "k:99" in e.keyspace
    # when no volatile keys remain and still over cap, DENYOOM fires
    for i in range(30):
        e.persist(f"k:{i}")
    config.set_config("search.max-memory-bytes", 1)
    with pytest.raises(OutOfMemoryError):
        e.hset("k:boom", {"t": "w"})


def test_allkeys_lru_evicts_least_recently_accessed():
    """allkeys-lru: cold keys go first; recently-read keys survive
    (valkey evict.c approximated LRU via sampling)."""
    e = Engine()
    e.execute("FT.CREATE", "lr", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    for i in range(120):
        e.hset(f"k:{i}", {"t": "q" * 60})
    hot = [f"k:{i}" for i in range(100, 120)]
    for k in hot:          # refresh recency on the hot set
        e.hgetall(k)
    used = e.used_memory_bytes()
    config.set_config("search.maxmemory-policy", "allkeys-lru")
    config.set_config("search.max-memory-bytes", int(used * 0.9))
    e.hset("k:new", {"t": "z"})
    # every hot key survives; something cold was evicted
    assert all(k in e.keyspace for k in hot)
    assert len(e.keyspace) < 121


def test_allkeys_lfu_evicts_least_frequent():
    e = Engine()
    e.execute("FT.CREATE", "lf", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    for i in range(120):
        e.hset(f"k:{i}", {"t": "q" * 60})
    hot = [f"k:{i}" for i in range(40, 60)]
    for _ in range(5):     # drive the lfu counters up on the hot set
        for k in hot:
            e.hgetall(k)
    used = e.used_memory_bytes()
    config.set_config("search.maxmemory-policy", "allkeys-lfu")
    config.set_config("search.max-memory-bytes", int(used * 0.9))
    e.hset("k:new", {"t": "z"})
    assert all(k in e.keyspace for k in hot)
    assert len(e.keyspace) < 121


def test_volatile_random_only_evicts_ttl_keys():
    e = Engine()
    e.execute("FT.CREATE", "vr", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    for i in range(100):
        e.hset(f"k:{i}", {"t": "y" * 80})
    for i in range(40):
        e.expire(f"k:{i}", 10_000)
    used = e.used_memory_bytes()
    config.set_config("search.maxmemory-policy", "volatile-random")
    config.set_config("search.max-memory-bytes", int(used * 0.95))
    e.hset("k:new", {"t": "z"})
    survivors = set(e.keyspace)
    # all evictions came from the volatile set
    assert {f"k:{i}" for i in range(40, 100)} <= survivors
    assert len(survivors) < 101


def test_volatile_lru_prefers_cold_volatile_keys():
    e = Engine()
    e.execute("FT.CREATE", "vl", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    for i in range(100):
        e.hset(f"k:{i}", {"t": "y" * 80})
        e.expire(f"k:{i}", 10_000)
    hot = [f"k:{i}" for i in range(80, 100)]
    for k in hot:
        e.hgetall(k)
    used = e.used_memory_bytes()
    config.set_config("search.maxmemory-policy", "volatile-lru")
    config.set_config("search.max-memory-bytes", int(used * 0.9))
    e.hset("k:new", {"t": "z"})
    assert all(k in e.keyspace for k in hot)
    assert len(e.keyspace) < 101
