"""Key TTL/expiry: lazy + active expiration removes keys from indexes.

Mirrors reference integration test_expired.py / test_eviction.py: expiry
fires a keyspace event that removes the key from every index; search
results never surface an expired key."""

import time

import pytest

from valkey_search_tpu.server.engine import Engine


@pytest.fixture()
def eng():
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    e.hset("k:1", {"t": "a"})
    e.hset("k:2", {"t": "a"})
    return e


def test_ttl_contract(eng):
    assert eng.execute("TTL", "missing") == -2
    assert eng.execute("TTL", "k:1") == -1
    assert eng.execute("EXPIRE", "k:1", "100") == 1
    assert 0 < eng.execute("TTL", "k:1") <= 100
    assert eng.execute("PERSIST", "k:1") == 1
    assert eng.execute("TTL", "k:1") == -1
    assert eng.execute("EXPIRE", "missing", "5") == 0


def test_lazy_expiry_on_access(eng):
    eng.execute("PEXPIRE", "k:1", "10")
    time.sleep(0.03)
    assert eng.hgetall("k:1") == {}
    assert eng.execute("FT.SEARCH", "i", "@t:{a}", "NOCONTENT") == [1, "k:2"]


def test_active_sweep(eng):
    eng.execute("PEXPIRE", "k:1", "5")
    eng.execute("PEXPIRE", "k:2", "5")
    time.sleep(0.03)
    assert eng.sweep_expired() == 2
    assert eng.execute("FT.SEARCH", "i", "@t:{a}", "NOCONTENT")[0] == 0
    from valkey_search_tpu.runtime.metrics import STATS

    assert STATS.get("keys_expired") >= 2


def test_search_never_returns_expired(eng):
    eng.execute("PEXPIRE", "k:2", "5")
    time.sleep(0.03)
    # no explicit access/sweep: content resolution must drop it
    r = eng.execute("FT.SEARCH", "i", "@t:{a}")
    keys = r[1::2]
    assert "k:2" not in keys


def test_write_after_expiry_reindexes(eng):
    eng.execute("PEXPIRE", "k:1", "5")
    time.sleep(0.03)
    eng.sweep_expired()
    eng.hset("k:1", {"t": "b"})
    assert eng.execute("TTL", "k:1") == -1  # new key, no ttl
    assert eng.execute("FT.SEARCH", "i", "@t:{b}", "NOCONTENT") == [1, "k:1"]


def test_copy_carries_source_ttl():
    """valkey COPY propagates the source expire (db.c copyCommand →
    setExpire); an expired source must not copy at all."""
    import time

    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    e.hset("src", {"f": "v"})
    e.expire("src", 50)
    assert e.copy("src", "dst") == 1
    assert 1 <= e.ttl("dst") <= 50
    # logically expired source: COPY sees nothing
    e.hset("gone", {"f": "v"})
    e._expiry["gone"] = time.time() - 1
    assert e.copy("gone", "dst2") == 0


def test_exists_type_keys_scan_hide_expired():
    import time

    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    e.hset("k1", {"f": "v"})
    e.hset("k2", {"f": "v"})
    e._expiry["k1"] = time.time() - 1  # logically expired, no cron yet
    assert e.execute("EXISTS", "k1") == 0
    assert e.execute("TYPE", "k1") == "none"
    assert e.execute("KEYS", "*") == ["k2"]
    cur, page = e.execute("SCAN", "0", "COUNT", "100")
    assert page == ["k2"]
