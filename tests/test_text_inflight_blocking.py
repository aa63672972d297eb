"""Full-text query blocking on in-flight mutations.

Mirrors /root/reference/integration/test_fulltext_inflight_blocking.py:
a text query issued while a mutation is queued or in flight parks and
retries until the schema settles, then answers from the POST-mutation
state — a blocked update can both remove a stale match and add a brand-new
one before the reply (postings have no per-key content revalidation, so
the reference blocks the whole query instead of postfiltering). Counters:
search_text_query_blocked_count / search_text_query_retry_count.
"""

import threading
import time

import pytest

from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.debug import PAUSEPOINTS
from valkey_search_tpu.server.engine import Engine


def _wait_for(fn, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if fn():
            return True
        time.sleep(0.01)
    return False


def _stat(e, name):
    return e.info(include_dev=True)[name]


@pytest.fixture
def engine():
    config.set_config("search.debug-mode", True)
    e = Engine(sync_ingest=False)
    yield e
    for p in ("mutation_processing", "block_mutation_queue"):
        e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", p)
    e.drain()


def test_text_query_blocks_and_retries(engine):
    e = engine
    e.execute("FT.CREATE", "idx", "SCHEMA", "content", "TEXT")
    e.hset("doc:1", {"content": "hello world"})
    e.hset("doc:2", {"content": "hello there"})
    e.drain()
    assert e.ft_search("idx", "@content:hello", "NOCONTENT")[0] == 2

    blocked0 = _stat(e, "search_text_query_blocked_count")

    # doc:1's update parks in flight at the processing gate
    e.execute("FT._DEBUG", "PAUSEPOINT", "SET", "mutation_processing")
    e.hset("doc:1", {"content": "updated1"})
    assert _wait_for(lambda: PAUSEPOINTS.waiting("mutation_processing") > 0)

    # doc:2's update stays queued behind the earlier queue gate
    e.execute("FT._DEBUG", "PAUSEPOINT", "SET", "block_mutation_queue")
    e.hset("doc:2", {"content": "updated2 hello"})

    res, err = [], []

    def search():
        try:
            res.append(e.ft_search("idx", "@content:hello"))
        except Exception as ex:  # pragma: no cover
            err.append(ex)

    t = threading.Thread(target=search)
    t.start()
    assert _wait_for(
        lambda: _stat(e, "search_text_query_blocked_count") > blocked0
    )
    assert t.is_alive() and not res  # parked, no premature stale answer

    # release doc:1; the query must retry and stay parked on doc:2
    retry0 = _stat(e, "search_text_query_retry_count")
    e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", "mutation_processing")
    assert _wait_for(
        lambda: _stat(e, "search_text_query_retry_count") > retry0
    )
    assert t.is_alive() and not res

    # release doc:2; the query completes against the settled index
    e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", "block_mutation_queue")
    t.join(timeout=10)
    assert not t.is_alive() and not err
    reply = res[0]
    # doc:1 lost 'hello'; doc:2 gained it via the blocked mutation
    assert reply[0] == 1 and reply[1] == "doc:2"
    fields = dict(zip(reply[2][::2], reply[2][1::2]))
    assert fields["content"] == "updated2 hello"


def test_hybrid_text_knn_blocks(engine):
    import numpy as np

    e = engine
    e.execute(
        "FT.CREATE", "idx", "SCHEMA", "content", "TEXT", "vec", "VECTOR",
        "FLAT", "6", "TYPE", "FLOAT32", "DIM", "4", "DISTANCE_METRIC", "L2",
    )
    v1 = np.zeros(4, np.float32)
    v2 = np.ones(4, np.float32)
    e.hset("doc:1", {"content": "hello world", "vec": v1.tobytes()})
    e.drain()

    e.execute("FT._DEBUG", "PAUSEPOINT", "SET", "mutation_processing")
    e.hset("doc:1", {"content": "updated", "vec": v2.tobytes()})
    assert _wait_for(lambda: PAUSEPOINTS.waiting("mutation_processing") > 0)

    res = []
    t = threading.Thread(
        target=lambda: res.append(
            e.ft_search(
                "idx", "(@content:hello)=>[KNN 1 @vec $q]",
                "PARAMS", "2", "q", v1.tobytes(), "NOCONTENT",
            )
        )
    )
    t.start()
    time.sleep(0.3)
    assert t.is_alive() and not res  # hybrid text queries block too

    e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", "mutation_processing")
    t.join(timeout=10)
    assert not t.is_alive()
    assert res[0][0] == 0  # 'hello' is gone after the mutation applied


def test_non_text_queries_do_not_block(engine):
    """Tag/numeric queries keep the postfilter path — they answer without
    waiting for an armed queue (the park budget is 250ms, not the full
    text-blocking timeout)."""
    e = engine
    e.execute("FT.CREATE", "idx", "SCHEMA", "n", "NUMERIC", "t", "TAG")
    for i in range(4):
        e.hset(f"k:{i}", {"n": str(i), "t": "a"})
    e.drain()

    e.execute("FT._DEBUG", "PAUSEPOINT", "SET", "block_mutation_queue")
    e.hset("k:0", {"n": "0", "t": "a"})
    blocked0 = _stat(e, "search_text_query_blocked_count")
    t0 = time.monotonic()
    r = e.ft_search("idx", "@n:[0 1]", "NOCONTENT")
    assert time.monotonic() - t0 < 2.0
    assert r[0] >= 1
    assert _stat(e, "search_text_query_blocked_count") == blocked0
    e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", "block_mutation_queue")
    e.drain()


def test_dropindex_while_query_blocked(engine):
    """FT.DROPINDEX while a text query is parked on an in-flight mutation:
    the query errors with index-not-found instead of crashing or answering
    (reference test_dropindex_with_blocked_queries; ResolveContent checks
    IsMarkedDestructing on every retry, content_resolution.cc:29-35)."""
    e = engine
    e.execute("FT.CREATE", "idx", "SCHEMA", "content", "TEXT")
    e.hset("doc:1", {"content": "hello world"})
    e.drain()

    e.execute("FT._DEBUG", "PAUSEPOINT", "SET", "mutation_processing")
    e.hset("doc:1", {"content": "updated"})
    assert _wait_for(lambda: PAUSEPOINTS.waiting("mutation_processing") > 0)

    res, err = [], []

    def search():
        try:
            res.append(e.ft_search("idx", "@content:hello"))
        except Exception as ex:
            err.append(ex)

    blocked0 = _stat(e, "search_text_query_blocked_count")
    t = threading.Thread(target=search)
    t.start()
    assert _wait_for(
        lambda: _stat(e, "search_text_query_blocked_count") > blocked0
    )

    e.execute("FT.DROPINDEX", "idx")
    e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", "mutation_processing")
    t.join(timeout=10)
    assert not t.is_alive()
    assert not res and len(err) == 1
    assert "not found" in str(err[0])
