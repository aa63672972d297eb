"""FT.AGGREGATE reply serialization parity between HASH and JSON keys.

Mirrors /root/reference/integration/test_aggregate_array_reply.py
(ReplyWithValue code paths in ft_aggregate.cc): numeric/tag/APPLY values
must be identical for HASH and JSON schemas under DIALECT 2, and DIALECT 3
must wrap JSON values in brackets while leaving HASH values untouched
(ft_aggregate.cc:209-216).
"""

import pytest

from valkey_search_tpu.server.engine import Engine

N_DOCS = 10


def _mk_hash(e):
    e.execute(
        "FT.CREATE", "hidx", "ON", "HASH", "PREFIX", "1", "h:",
        "SCHEMA",
        "n1", "AS", "n1", "NUMERIC", "n2", "AS", "n2", "NUMERIC",
        "t1", "AS", "t1", "TAG", "t2", "AS", "t2", "TAG",
    )
    for i in range(N_DOCS):
        e.hset(f"h:{i:04d}", {
            "n1": str(i), "n2": str(i * 10),
            "t1": f"tag_a{i % 3}", "t2": f"tag_b{i % 5}",
        })


def _mk_json(e):
    e.execute(
        "FT.CREATE", "jidx", "ON", "JSON", "PREFIX", "1", "j:",
        "SCHEMA",
        "$.n1", "AS", "n1", "NUMERIC", "$.n2", "AS", "n2", "NUMERIC",
        "$.t1", "AS", "t1", "TAG", "$.t2", "AS", "t2", "TAG",
    )
    for i in range(N_DOCS):
        e.execute(
            "JSON.SET", f"j:{i:04d}", "$",
            '{"n1": %d, "n2": %d, "t1": "tag_a%d", "t2": "tag_b%d"}'
            % (i, i * 10, i % 3, i % 5),
        )


@pytest.fixture
def engine():
    e = Engine(sync_ingest=True)
    _mk_hash(e)
    _mk_json(e)
    return e


def _rows(result):
    out = []
    for row in result[1:]:
        d = {}
        for i in range(0, len(row), 2):
            key = row[i]
            if isinstance(key, bytes):
                key = key.decode()
            if key.startswith("$."):
                key = key[2:]
            v = row[i + 1]
            d[key] = v.decode() if isinstance(v, bytes) else v
        out.append(d)
    return out


def _agg(e, index, *args):
    return _rows(e.execute("FT.AGGREGATE", index, "@n1:[0 inf]", *args))


def test_load_numeric_fields_parity(engine):
    h = _agg(engine, "hidx", "LOAD", "2", "@n1", "@n2",
             "SORTBY", "2", "@n1", "ASC", "DIALECT", "2")
    j = _agg(engine, "jidx", "LOAD", "2", "@n1", "@n2",
             "SORTBY", "2", "@n1", "ASC", "DIALECT", "2")
    assert len(h) == len(j) == N_DOCS
    for hr, jr in zip(h, j):
        assert float(hr["n1"]) == float(jr["n1"])
        assert float(hr["n2"]) == float(jr["n2"])


def test_load_tag_fields_parity(engine):
    h = _agg(engine, "hidx", "LOAD", "2", "@t1", "@t2",
             "SORTBY", "2", "@t1", "ASC", "DIALECT", "2")
    j = _agg(engine, "jidx", "LOAD", "2", "@t1", "@t2",
             "SORTBY", "2", "@t1", "ASC", "DIALECT", "2")
    assert len(h) == len(j) == N_DOCS
    for hr, jr in zip(h, j):
        assert hr["t1"] == jr["t1"]
        assert hr["t2"] == jr["t2"]


@pytest.mark.parametrize("expr_str,alias", [
    ("@n1+@n2", "sum"), ("@n1*@n2", "product"), ("@n1-@n2", "diff"),
])
def test_apply_arithmetic_parity(engine, expr_str, alias):
    h = _agg(engine, "hidx", "LOAD", "2", "@n1", "@n2",
             "APPLY", expr_str, "AS", alias,
             "SORTBY", "2", "@n1", "ASC", "DIALECT", "2")
    j = _agg(engine, "jidx", "LOAD", "2", "@n1", "@n2",
             "APPLY", expr_str, "AS", alias,
             "SORTBY", "2", "@n1", "ASC", "DIALECT", "2")
    assert len(h) == len(j) == N_DOCS
    for hr, jr in zip(h, j):
        assert float(hr[alias]) == float(jr[alias])


def test_full_pipeline_parity(engine):
    args = ("LOAD", "2", "@n1", "@t1", "FILTER", "@n1 > 2",
            "APPLY", "@n1 * 2", "AS", "doubled",
            "SORTBY", "2", "@n1", "ASC", "LIMIT", "0", "5", "DIALECT", "2")
    h = _agg(engine, "hidx", *args)
    j = _agg(engine, "jidx", *args)
    assert len(h) == len(j) == 5
    for hr, jr in zip(h, j):
        assert float(hr["n1"]) == float(jr["n1"])
        assert float(hr["doubled"]) == float(jr["doubled"])
        assert hr["t1"] == jr["t1"]


def test_groupby_reduce_parity(engine):
    args = ("LOAD", "1", "@t1",
            "GROUPBY", "1", "@t1",
            "REDUCE", "COUNT", "0", "AS", "n",
            "REDUCE", "SUM", "1", "@n1", "AS", "total",
            "SORTBY", "2", "@t1", "ASC", "DIALECT", "2")
    h = _agg(engine, "hidx", *args)
    j = _agg(engine, "jidx", *args)
    assert len(h) == len(j) == 3
    for hr, jr in zip(h, j):
        assert hr["t1"] == jr["t1"]
        assert float(hr["n"]) == float(jr["n"])
        assert float(hr["total"]) == float(jr["total"])


def test_dialect_3_json_wrapping(engine):
    """DIALECT 3 wraps JSON scalar values in brackets; HASH untouched."""
    args = ("LOAD", "1", "@t1", "SORTBY", "2", "@t1", "ASC",
            "LIMIT", "0", "1", "DIALECT", "3")
    h = _agg(engine, "hidx", *args)
    j = _agg(engine, "jidx", *args)
    assert h and j
    assert not h[0]["t1"].startswith("[")
    assert j[0]["t1"].startswith("[") and j[0]["t1"].endswith("]")
    assert j[0]["t1"] == "[" + h[0]["t1"] + "]"
    # numeric + APPLY-computed values are wrapped too (ReplyWithValue is
    # keyed on the schema data type, not the field's provenance)
    j2 = _agg(engine, "jidx", "LOAD", "1", "@n1",
              "APPLY", "@n1 * 2", "AS", "d",
              "SORTBY", "2", "@n1", "ASC", "LIMIT", "0", "1", "DIALECT", "3")
    assert j2[0]["n1"].startswith("[")
    assert j2[0]["d"].startswith("[")


def test_dialect_2_never_wraps(engine):
    j = _agg(engine, "jidx", "LOAD", "1", "@t1",
             "SORTBY", "2", "@t1", "ASC", "LIMIT", "0", "1", "DIALECT", "2")
    assert not j[0]["t1"].startswith("[")


@pytest.mark.parametrize("bad", ["1", "5", "0", "x"])
def test_dialect_out_of_range_errors(engine, bad):
    with pytest.raises(Exception, match="[Dd]ialect"):
        engine.execute("FT.AGGREGATE", "hidx", "@n1:[0 inf]",
                       "DIALECT", bad)


def test_json_array_values_serialize_as_resp_arrays(engine):
    """Raw JSON array values LOADed into an aggregate reply serialize as
    nested RESP arrays, never bracket-wrapped (reference
    SerializeArrayToResp, ft_aggregate.cc:134-148, IsArray checked before
    the dialect branch)."""
    e = engine
    e.execute("FT.CREATE", "aidx", "ON", "JSON", "PREFIX", "1", "a:",
              "SCHEMA", "$.n", "AS", "n", "NUMERIC")
    e.execute("JSON.SET", "a:1", "$", '{"n": 1, "arr": [1, 2, 3]}')
    for dialect in ("2", "3"):
        res = e.execute("FT.AGGREGATE", "aidx", "@n:[0 5]",
                        "LOAD", "1", "@arr", "DIALECT", dialect)
        assert res[0] == 1
        row = dict(zip(res[1][::2], res[1][1::2]))
        assert row["arr"] == ["1", "2", "3"], (dialect, row)


def test_json_multivalue_tag_path_stays_scalar(engine):
    """$.tags[*]-indexed TAG fields normalize to the joined scalar (tag
    normalization happens at fetch, like the reference's indexer-typed
    branch), and dialect 3 wraps that scalar."""
    e = engine
    e.execute("FT.CREATE", "midx", "ON", "JSON", "PREFIX", "1", "m:",
              "SCHEMA", "$.n", "AS", "n", "NUMERIC",
              "$.tags[*]", "AS", "t", "TAG")
    e.execute("JSON.SET", "m:1", "$", '{"n": 1, "tags": ["a", "b"]}')
    res = e.execute("FT.AGGREGATE", "midx", "@n:[0 5]", "LOAD", "1", "@t")
    row = dict(zip(res[1][::2], res[1][1::2]))
    assert row["t"] == "a,b"
    res = e.execute("FT.AGGREGATE", "midx", "@n:[0 5]", "LOAD", "1", "@t",
                    "DIALECT", "3")
    row = dict(zip(res[1][::2], res[1][1::2]))
    assert row["t"] == "[a,b]"


def test_groupby_key_fast_path_parity():
    """GROUPBY @__key must yield one group per key (the columnar COUNT
    fast path previously collapsed everything into one keyless bucket —
    r3 review regression)."""
    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    e.execute("FT.CREATE", "gk", "ON", "HASH", "PREFIX", "1", "d:",
              "SCHEMA", "t", "TAG")
    for i in range(4):
        e.execute("HSET", f"d:{i}", "t", "x")
    r = e.execute("FT.AGGREGATE", "gk", "*", "LOAD", "1", "@__key",
                  "GROUPBY", "1", "@__key",
                  "REDUCE", "COUNT", "0", "AS", "c")
    assert r[0] == 4
    rows = {tuple(x) for x in map(tuple, r[1:])}
    assert ("__key", "d:0", "c", "1") in rows
