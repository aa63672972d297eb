"""Reference configurables surface + enforcement drills.

Mirrors docs/topics/search-configurables.md: every documented search.*
name is CONFIG-addressable (native entry or alias onto this runtime's
spelling), and the limit configs actually gate their paths (fuzzy
distance, term expansion, tag prefix length, KNN k, vector dims,
numeric field length, query string size).
"""

import numpy as np
import pytest

from valkey_search_tpu.runtime import config
from valkey_search_tpu.server.engine import Engine

REFERENCE_NAMES = [
    "search.query-string-bytes", "search.query-string-depth",
    "search.query-string-terms-count", "search.fuzzy-max-distance",
    "search.max-term-expansions", "search.tag-min-prefix-length",
    "search.max-vector-knn", "search.max-tag-field-length",
    "search.max-numeric-field-length", "search.max-vector-attributes",
    "search.max-vector-dimensions", "search.max-vector-m",
    "search.max-vector-ef-construction", "search.max-vector-ef-runtime",
    "search.max-search-result-record-size",
    "search.max-search-result-fields-count",
    "search.prefer-consistent-results",
    "search.drain-mutation-queue-on-save",
    "search.ft-info-timeout-ms", "search.ft-info-rpc-timeout-ms",
    "search.coordinator-query-timeout-secs",
    "search.local-fanout-queue-wait-threshold",
    "search.thread-pool-wait-time-samples", "search.high-priority-weight",
    "search.utility-threads", "search.max-worker-suspension-secs",
    "search.cluster-map-expiration-ms",
    "search.proximity-inorder-compat-mode",
    "search.search-result-background-cleanup",
    "search.default-timeout-ms", "search.max-prefixes",
    "search.hnsw-block-size", "search.reader-threads",
    "search.writer-threads", "search.use-coordinator",
]


@pytest.fixture(autouse=True)
def _clean():
    yield
    config.REGISTRY.reset_all()


def test_all_reference_config_names_addressable():
    for name in REFERENCE_NAMES:
        config.get(name)  # raises ConfigError if unknown


def test_aliases_share_one_value():
    config.set_config("search.query-string-depth", 123)
    assert int(config.get("search.max-query-depth")) == 123
    config.set_config("search.max-tag-field-len", 99)
    assert int(config.get("search.max-tag-field-length")) == 99


def test_fuzzy_max_distance_enforced():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "c1", "SCHEMA", "t", "TEXT")
    e.hset("k", {"t": "hello"})
    assert e.execute("FT.SEARCH", "c1", "%%%hello%%%", "NOCONTENT")[0] == 1
    config.set_config("search.fuzzy-max-distance", 2)
    with pytest.raises(Exception, match="fuzzy distance"):
        e.execute("FT.SEARCH", "c1", "%%%hello%%%")


def test_tag_min_prefix_length_enforced():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "c2", "SCHEMA", "t", "TAG")
    e.hset("k", {"t": "yellow"})
    assert e.execute("FT.SEARCH", "c2", "@t:{ye*}", "NOCONTENT")[0] == 1
    with pytest.raises(Exception, match="too short for prefix wildcard"):
        e.execute("FT.SEARCH", "c2", "@t:{y*}")
    config.set_config("search.tag-min-prefix-length", 1)
    assert e.execute("FT.SEARCH", "c2", "@t:{y*}", "NOCONTENT")[0] == 1


def test_max_term_expansions_caps_prefix(monkeypatch):
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "c3", "SCHEMA", "t", "TEXT")
    for i in range(30):
        e.hset(f"k{i}", {"t": f"word{i:02d}"})
    assert e.execute("FT.SEARCH", "c3", "@t:word*", "NOCONTENT",
                     "LIMIT", "0", "50")[0] == 30
    config.set_config("search.max-term-expansions", 5)
    assert e.execute("FT.SEARCH", "c3", "@t:word*", "NOCONTENT",
                     "LIMIT", "0", "50")[0] == 5


def test_max_vector_knn_enforced():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "c4", "SCHEMA", "v", "VECTOR", "FLAT", "6",
              "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2")
    config.set_config("search.max-vector-knn", 10)
    q = np.zeros(3, np.float32).tobytes()
    with pytest.raises(Exception, match="max-vector-knn"):
        e.execute("FT.SEARCH", "c4", "*=>[KNN 100 @v $q]",
                  "PARAMS", "2", "q", q)


def test_max_vector_dimensions_enforced():
    config.set_config("search.max-vector-dimensions", 64)
    e = Engine(sync_ingest=True)
    with pytest.raises(Exception, match="max-vector-dimensions"):
        e.execute("FT.CREATE", "c5", "SCHEMA", "v", "VECTOR", "FLAT", "6",
                  "TYPE", "FLOAT32", "DIM", "128", "DISTANCE_METRIC", "L2")


def test_max_numeric_field_length_invalid_data():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "c6", "SCHEMA", "n", "NUMERIC")
    e.hset("ok", {"n": "42"})
    e.hset("bad", {"n": "1" + "0" * 200})  # 201 chars > 128 limit
    r = e.execute("FT.SEARCH", "c6", "@n:[0 inf]", "NOCONTENT",
                  "LIMIT", "0", "10")
    assert r[0] == 1 and str(r[1]) == "ok"


def test_query_string_bytes_enforced():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "c7", "SCHEMA", "t", "TAG")
    config.set_config("search.query-string-bytes", 64)
    with pytest.raises(Exception, match="query-string-bytes"):
        e.execute("FT.SEARCH", "c7", "@t:{" + "x" * 200 + "}")


# -- review-fix regressions ---------------------------------------------------

def test_config_get_wire_resolves_aliases():
    from valkey_search_tpu.cluster.transport import RespConnection
    from valkey_search_tpu.server.resp import RespServer

    srv = RespServer(Engine(sync_ingest=True), port=0)
    srv.start()
    try:
        c = RespConnection(("127.0.0.1", srv.port))
        c.cmd("CONFIG", "SET", "search.default-timeout-ms", "12345")
        r = c.cmd("CONFIG", "GET", "search.default-timeout-ms")
        assert r and r[1] == b"12345", r
        r2 = c.cmd("CONFIG", "GET", "search.timeout-ms")
        assert r2[1] == b"12345"  # one shared value
        c.close()
    finally:
        srv.close()


def test_max_term_expansions_caps_fuzzy():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "cf", "SCHEMA", "t", "TEXT")
    for i in range(30):
        e.hset(f"k{i}", {"t": f"wor{chr(97 + i % 26)}{i:02d}"})
    config.set_config("search.max-term-expansions", 4)
    r = e.execute("FT.SEARCH", "cf", "%%wor%%", "NOCONTENT",
                  "LIMIT", "0", "50")
    assert r[0] <= 4


def test_max_vector_m_config_is_the_limit():
    config.set_config("search.max-vector-m", 1000)
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "cm", "SCHEMA", "v", "VECTOR", "HNSW", "8",
              "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2",
              "M", "600")
    with pytest.raises(Exception, match=r"M must be in \[1, 1000\]"):
        e.execute("FT.CREATE", "cm2", "SCHEMA", "v", "VECTOR", "HNSW", "8",
                  "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2",
                  "M", "1200")


def test_return_branch_respects_record_caps():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "cr", "SCHEMA", "t", "TAG")
    e.hset("big", {"t": "x", "huge": "h" * 4000, "small": "s"})
    config.set_config("search.max-search-result-record-size", 200)
    r = e.execute("FT.SEARCH", "cr", "@t:{x}", "RETURN", "2",
                  "huge", "small")
    fields = dict(zip(r[2][::2], r[2][1::2]))
    assert "huge" not in fields  # truncated by the byte cap


def test_escaped_trailing_star_is_literal_tag():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "ce", "SCHEMA", "t", "TAG")
    e.hset("lit", {"t": "y*"})
    # escaped star: literal match, NOT a too-short prefix wildcard error
    assert e.execute("FT.SEARCH", "ce", r"@t:{y\*}", "NOCONTENT")[0] == 1
