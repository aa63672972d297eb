"""Fuzz: random query strings and argv vectors must raise typed errors or
return well-formed replies — never crash, hang, or corrupt state.

The reference gets this robustness from its depth/term-count limits and
typed status propagation (filter_parser depth limits, VMSDK status
macros); here the same contract is checked by hammering the public
surfaces with garbage."""

import random
import string

import numpy as np
import pytest

from valkey_search_tpu.query.parser import QuerySyntaxError, parse_query
from valkey_search_tpu.server.engine import CommandError, Engine

ALPHABET = string.ascii_letters + string.digits + " @${}[]()|\"'%*-:~!;,.\\<>=+&"


def _rand_text(rng, n):
    return "".join(rng.choice(ALPHABET) for _ in range(n))


def test_parse_query_never_crashes():
    rng = random.Random(1234)
    ok = err = 0
    for _ in range(3000):
        q = _rand_text(rng, rng.randrange(1, 60))
        try:
            parse_query(q, {"q": b"\x00" * 16, "p": "5"})
            ok += 1
        except (QuerySyntaxError, ValueError):
            err += 1
    # both outcomes occur; no other exception type escaped
    assert ok > 0 and err > 0


def test_engine_execute_garbage_argv():
    rng = random.Random(99)
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG", "n", "NUMERIC", "title", "TEXT")
    e.hset("k:1", {"t": "a", "n": "1", "title": "hello world"})
    cmds = ["FT.SEARCH", "FT.AGGREGATE", "FT.INFO", "FT.CREATE",
            "FT.DROPINDEX", "FT._DEBUG", "HSET", "DEL", "EXPIRE", "TTL"]
    for _ in range(800):
        argv = [rng.choice(cmds)] + [
            _rand_text(rng, rng.randrange(1, 12))
            for _ in range(rng.randrange(0, 6))
        ]
        try:
            r = e.execute(*argv)
            if argv[0] == "FT.SEARCH" and isinstance(r, list) and r:
                assert isinstance(r[0], int) and r[0] >= 0
        except Exception as exc:
            # only typed errors may escape
            assert isinstance(exc, (ValueError, KeyError, PermissionError,
                                    TimeoutError)), type(exc)
    # the engine still works after the storm
    assert e.execute("FT.SEARCH", "i", "@t:{a}", "NOCONTENT") == [1, "k:1"]


def test_deep_nesting_bounded():
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "SCHEMA", "t", "TAG")
    deep = "(" * 3000 + "@t:{a}" + ")" * 3000
    with pytest.raises(ValueError):
        e.execute("FT.SEARCH", "i", deep)


def test_huge_term_count_bounded():
    e = Engine()
    e.execute("FT.CREATE", "i", "ON", "HASH", "SCHEMA", "title", "TEXT")
    q = " ".join(f"w{i}" for i in range(5000))
    with pytest.raises(ValueError):
        e.execute("FT.SEARCH", "i", q)


def test_random_vector_blobs_rejected_cleanly(rng):
    e = Engine()
    e.execute("FT.CREATE", "v", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "emb", "VECTOR", "FLAT", "6",
              "TYPE", "FLOAT32", "DIM", "8", "DISTANCE_METRIC", "L2")
    r = random.Random(5)
    for i in range(100):
        blob = bytes(r.randrange(256) for _ in range(r.randrange(0, 64)))
        e.hset(f"k:{i}", {"emb": blob})  # wrong sizes → INVALID_DATA path
    good = rng.standard_normal(8).astype(np.float32)
    e.hset("k:good", {"emb": good.tobytes()})
    res = e.execute("FT.SEARCH", "v", "*=>[KNN 5 @emb $q]",
                    "PARAMS", "2", "q", good.tobytes(), "NOCONTENT")
    assert res[1] == "k:good"
    # only blobs that were exactly 32 bytes indexed; the rest dropped
    schema = e.manager.get("v")
    for key in schema.attribute("emb").index.tracked_keys():
        if key != "k:good":
            assert len(e.hgetall(key)["emb"]) == 32
