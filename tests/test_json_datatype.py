"""ON JSON schemas: JSONPath identifiers across all index kinds.

Mirrors reference attribute_data_type coverage (HashAttributeDataType vs
JsonAttributeDataType, src/attribute_data_type.{h,cc}) and the JSON
integration tests."""

import json

import numpy as np
import pytest

from valkey_search_tpu.schema.attribute_data_type import (
    normalize_json_value,
    resolve_json_path,
)
from valkey_search_tpu.server.engine import Engine


def test_resolve_json_path():
    doc = {"a": {"b": [1, 2, {"c": "x"}]}, "top": 5}
    assert resolve_json_path(doc, "$") == doc
    assert resolve_json_path(doc, "$.top") == 5
    assert resolve_json_path(doc, "$.a.b[1]") == 2
    assert resolve_json_path(doc, "$.a.b[2].c") == "x"
    assert resolve_json_path(doc, "$.missing") is None
    assert resolve_json_path(doc, "$.a.b[9]") is None
    assert resolve_json_path(doc, "top") == 5  # bare name convenience


def test_normalize_json_values():
    assert normalize_json_value(True) == "true"
    assert normalize_json_value(3) == "3"
    assert normalize_json_value(2.5) == "2.5"
    assert normalize_json_value("s") == "s"
    assert normalize_json_value([1.0, 2.0]) == [1.0, 2.0]
    assert normalize_json_value(["a", "b"]) == "a,b"
    assert normalize_json_value({"nested": 1}) is None


@pytest.fixture()
def jeng(rng):
    e = Engine()
    e.execute(
        "FT.CREATE", "jidx", "ON", "JSON", "PREFIX", "1", "j:",
        "SCHEMA",
        "$.vec", "AS", "vec", "VECTOR", "FLAT", "6",
        "TYPE", "FLOAT32", "DIM", "4", "DISTANCE_METRIC", "L2",
        "$.meta.color", "AS", "color", "TAG",
        "$.meta.price", "AS", "price", "NUMERIC",
        "$.title", "AS", "title", "TEXT",
    )
    vecs = rng.standard_normal((20, 4)).astype(np.float32)
    for i, v in enumerate(vecs):
        e.execute("JSON.SET", f"j:{i}", "$", json.dumps({
            "vec": [float(x) for x in v],
            "meta": {"color": ["red", "blue"][i % 2], "price": i},
            "title": f"document number {i} about searching",
        }))
    return e, vecs


def test_json_knn(jeng):
    e, vecs = jeng
    q = vecs[7].tobytes()
    r = e.execute("FT.SEARCH", "jidx", "*=>[KNN 3 @vec $q]",
                  "PARAMS", "2", "q", q, "NOCONTENT")
    assert r[1] == "j:7"


def test_json_tag_numeric_text(jeng):
    e, vecs = jeng
    r = e.execute("FT.SEARCH", "jidx", "@color:{red}", "NOCONTENT",
                  "LIMIT", "0", "50")
    assert r[0] == 10
    r2 = e.execute("FT.SEARCH", "jidx", "@price:[5 8]", "NOCONTENT")
    assert {k for k in r2[1:]} == {f"j:{i}" for i in range(5, 9)}
    r3 = e.execute("FT.SEARCH", "jidx", "@title:searching", "NOCONTENT",
                   "LIMIT", "0", "50")
    assert r3[0] == 20


def test_json_nested_update_and_delete(jeng):
    e, vecs = jeng
    e.execute("JSON.SET", "j:3", "$.meta.color", '"gold"')
    r = e.execute("FT.SEARCH", "jidx", "@color:{gold}", "NOCONTENT")
    assert r == [1, "j:3"]
    # vector unchanged by nested update
    q = vecs[3].tobytes()
    r2 = e.execute("FT.SEARCH", "jidx", "*=>[KNN 1 @vec $q]",
                   "PARAMS", "2", "q", q, "NOCONTENT")
    assert r2[1] == "j:3"
    e.delete("j:3")
    assert e.execute("FT.SEARCH", "jidx", "@color:{gold}", "NOCONTENT")[0] == 0


def test_json_get(jeng):
    e, vecs = jeng
    assert json.loads(e.execute("JSON.GET", "j:1", "$.meta.color")) == "blue"
    full = json.loads(e.execute("JSON.GET", "j:1"))
    assert full["meta"]["price"] == 1
    assert e.execute("JSON.GET", "nope") is None


def test_hash_schema_ignores_json_docs(rng):
    e = Engine()
    e.execute("FT.CREATE", "h", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    e.execute("JSON.SET", "k:1", "$", '{"t": "x"}')
    assert e.execute("FT.SEARCH", "h", "@t:{x}", "NOCONTENT")[0] == 0
    e.hset("k:2", {"t": "x"})
    assert e.execute("FT.SEARCH", "h", "@t:{x}", "NOCONTENT") == [1, "k:2"]


def test_json_missing_attribute_partial_index(jeng):
    e, vecs = jeng
    e.execute("JSON.SET", "j:100", "$", json.dumps({
        "title": "no vector here", "meta": {"color": "green", "price": 1}
    }))
    r = e.execute("FT.SEARCH", "jidx", "@color:{green}", "NOCONTENT")
    assert r == [1, "j:100"]
    # KNN never returns it
    q = vecs[0].tobytes()
    r2 = e.execute("FT.SEARCH", "jidx", "*=>[KNN 21 @vec $q]",
                   "PARAMS", "2", "q", q, "NOCONTENT")
    assert "j:100" not in r2[1:]


def test_json_roundtrip_persistence(jeng, tmp_path):
    e, vecs = jeng
    p = str(tmp_path / "j.vstpu")
    e.save(p)
    e2 = Engine.load(p)
    q = vecs[7].tobytes()
    r = e2.execute("FT.SEARCH", "jidx", "*=>[KNN 3 @vec $q]",
                   "PARAMS", "2", "q", q, "NOCONTENT")
    assert r[1] == "j:7"
    assert e2.execute("FT.SEARCH", "jidx", "@color:{blue}", "NOCONTENT",
                      "LIMIT", "0", "50")[0] == 10


def test_json_wildcard_tag_arrays():
    """`$.tags[*]` / nested `$.items[*].color` multi-value TAG paths
    (Redisearch JSON array semantics)."""
    import json as _json

    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    e.execute("FT.CREATE", "jw", "ON", "JSON", "PREFIX", "1", "j:",
              "SCHEMA", "$.tags[*]", "AS", "tags", "TAG",
              "$.items[*].color", "AS", "color", "TAG")
    e.json_set("j:1", "$", _json.dumps({
        "tags": ["red", "sale"],
        "items": [{"color": "blue"}, {"color": "green"}],
    }))
    e.json_set("j:2", "$", _json.dumps({
        "tags": ["sale"], "items": [{"color": "blue"}],
    }))
    r = e.execute("FT.SEARCH", "jw", "@tags:{red}", "NOCONTENT")
    assert r[0] == 1 and _s(r[1]) == "j:1"
    r = e.execute("FT.SEARCH", "jw", "@tags:{sale}", "NOCONTENT")
    assert r[0] == 2
    r = e.execute("FT.SEARCH", "jw", "@color:{green}", "NOCONTENT")
    assert r[0] == 1 and _s(r[1]) == "j:1"
    r = e.execute("FT.SEARCH", "jw", "@color:{blue}", "NOCONTENT")
    assert r[0] == 2


def _s(v):
    return v.decode() if isinstance(v, bytes) else v
