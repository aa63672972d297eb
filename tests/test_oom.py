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
