"""In-flight-mutation postfilter (predicate revalidation) drills.

Mirrors /root/reference/integration/test_postfilter.py: block the mutation
queue (ft._debug PAUSEPOINT block_mutation_queue), mutate a result key so
the index is stale, and verify the reply revalidates the predicate against
the *fetched content* — in-range overwrites keep the key (new content),
out-of-range overwrites drop it, unparseable values drop it WITHOUT
recording a revalidation, and deletes drop it without a revalidation.
The search_predicate_revalidation dev counter tracks the recorded ones
(reference: search_predicate_revalidation INFO field).
"""

import json

import pytest

from valkey_search_tpu.server.engine import Engine


def _rows(reply):
    """[count, key, [f, v, ...], ...] -> {key: {field: value}}"""
    out = {}
    i = 1
    while i < len(reply):
        key = reply[i]
        fields = reply[i + 1]
        out[key] = {fields[j]: fields[j + 1] for j in range(0, len(fields), 2)}
        i += 2
    return out


def _reval(e):
    return e.info(include_dev=True)["search_predicate_revalidation"]


def _block(e):
    e.execute("FT._DEBUG", "PAUSEPOINT", "SET", "block_mutation_queue")


def _release(e):
    e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", "block_mutation_queue")
    e.drain()


@pytest.fixture
def engine():
    from valkey_search_tpu.runtime import config

    e = Engine(sync_ingest=False)
    config.set_config("search.debug-mode", True)
    yield e
    # never leave the gate armed for the next test
    e.execute("FT._DEBUG", "PAUSEPOINT", "RESET", "block_mutation_queue")
    e.drain()


def test_postfilter_hash(engine):
    e = engine
    e.execute("FT.CREATE", "idx", "SCHEMA", "n", "NUMERIC", "t", "TAG")
    for i in range(10):
        e.hset(f"k:{i}", {"n": str(i), "t": f"tag{i}"})
    e.drain()

    base = _reval(e)

    # no in-flight mutations: plain index-side resolution, no revalidation
    r = _rows(e.ft_search("idx", "@n:[0 1]"))
    assert r["k:0"]["n"] == "0" and r["k:1"]["n"] == "1"
    assert _reval(e) == base

    # Case 1: overwrite with another in-range value — kept, NEW content
    _block(e)
    e.hset("k:0", {"n": "1", "t": "tag0"})
    r = _rows(e.ft_search("idx", "@n:[0 1]"))
    assert r["k:0"]["n"] == "1" and r["k:1"]["n"] == "1"
    assert _reval(e) == base + 1
    _release(e)

    # Case 2: overwrite with out-of-range value — dropped, counted
    _block(e)
    e.hset("k:0", {"n": "100", "t": "tag0"})
    r = _rows(e.ft_search("idx", "@n:[0 1]"))
    assert set(r) == {"k:1"}
    assert _reval(e) == base + 2
    _release(e)

    # Case 3: overwrite with an unparseable value — dropped, NOT counted
    e.hset("k:0", {"n": "0", "t": "tag0"})
    e.drain()
    _block(e)
    e.hset("k:0", {"n": "badvalue", "t": "tag0"})
    r = _rows(e.ft_search("idx", "@n:[0 1]"))
    assert set(r) == {"k:1"}
    assert _reval(e) == base + 2
    _release(e)

    # Case 4: delete — dropped without a revalidation ("delete isn't
    # filtered", reference test_postfilter.py:78)
    e.hset("k:0", {"n": "0", "t": "tag0"})
    e.drain()
    _block(e)
    e.execute("DEL", "k:0")
    r = _rows(e.ft_search("idx", "@n:[0 1]"))
    assert set(r) == {"k:1"}
    assert _reval(e) == base + 2
    _release(e)


def test_postfilter_tag_content(engine):
    e = engine
    e.execute("FT.CREATE", "idx", "SCHEMA", "t", "TAG")
    for i in range(5):
        e.hset(f"k:{i}", {"t": f"tag{i}"})
    e.drain()
    base = _reval(e)

    # stale index says tag1; new content says other → dropped, counted
    _block(e)
    e.hset("k:1", {"t": "other"})
    r = _rows(e.ft_search("idx", "@t:{tag1}"))
    assert not r
    assert _reval(e) == base + 1
    _release(e)

    # in-range retag (prefix pattern still matches new content) → kept
    _block(e)
    e.hset("k:2", {"t": "tag2b"})
    r = _rows(e.ft_search("idx", "@t:{tag2*}"))
    assert set(r) == {"k:2"} and r["k:2"]["t"] == "tag2b"
    assert _reval(e) == base + 2
    _release(e)


def test_postfilter_conjunction_invalid(engine):
    """AND with an unparseable conjunct drops the key uncounted, but a
    definitively-False conjunct wins over invalid (drop IS counted)."""
    e = engine
    e.execute("FT.CREATE", "idx", "SCHEMA", "n", "NUMERIC", "t", "TAG")
    for i in range(4):
        e.hset(f"k:{i}", {"n": str(i), "t": "a"})
    e.drain()
    base = _reval(e)

    _block(e)
    e.hset("k:1", {"n": "nope", "t": "a"})  # invalid numeric, tag matches
    r = _rows(e.ft_search("idx", "@t:{a} @n:[0 2]"))
    assert set(r) == {"k:0", "k:2"}
    assert _reval(e) == base  # invalid → uncounted
    _release(e)

    e.hset("k:1", {"n": "1", "t": "a"})  # restore indexable state
    e.drain()
    _block(e)
    e.hset("k:1", {"n": "nope", "t": "b"})  # tag now False → counted drop
    r = _rows(e.ft_search("idx", "@t:{a} @n:[0 2]"))
    assert set(r) == {"k:0", "k:2"}
    assert _reval(e) == base + 1
    _release(e)


def test_postfilter_json(engine):
    e = engine
    e.execute(
        "FT.CREATE", "jdx", "ON", "JSON", "SCHEMA", "$.n", "AS", "n",
        "NUMERIC", "$.t", "AS", "t", "TAG",
    )
    for i in range(10):
        e.execute("JSON.SET", f"j:{i}", "$", json.dumps({"n": i, "t": "x"}))
    e.drain()
    base = _reval(e)

    r = _rows(e.ft_search("jdx", "@n:[0 1]"))
    assert set(r) == {"j:0", "j:1"}
    assert _reval(e) == base

    # in-range overwrite → kept with new content
    _block(e)
    e.execute("JSON.SET", "j:0", "$.n", "1")
    r = _rows(e.ft_search("jdx", "@n:[0 1]"))
    assert set(r) == {"j:0", "j:1"}
    assert json.loads(r["j:0"]["$"])["n"] == 1
    assert _reval(e) == base + 1
    _release(e)

    # out-of-range overwrite → dropped, counted
    _block(e)
    e.execute("JSON.SET", "j:0", "$.n", "100")
    r = _rows(e.ft_search("jdx", "@n:[0 1]"))
    assert set(r) == {"j:1"}
    assert _reval(e) == base + 2
    _release(e)

    # field removed from the document → dropped, counted (reference json
    # case "set missing value": json.del $.n is a revalidated miss)
    e.execute("JSON.SET", "j:0", "$", json.dumps({"n": 0, "t": "x"}))
    e.drain()
    _block(e)
    e.execute("JSON.SET", "j:0", "$", json.dumps({"t": "x"}))
    r = _rows(e.ft_search("jdx", "@n:[0 1]"))
    assert set(r) == {"j:1"}
    assert _reval(e) == base + 3
    _release(e)

    # whole-key delete → dropped without a revalidation
    e.execute("JSON.SET", "j:0", "$", json.dumps({"n": 0, "t": "x"}))
    e.drain()
    _block(e)
    e.execute("DEL", "j:0")
    r = _rows(e.ft_search("jdx", "@n:[0 1]"))
    assert set(r) == {"j:1"}
    assert _reval(e) == base + 3
    _release(e)
