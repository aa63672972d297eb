"""Checkpoint save/restore tests.

Mirrors reference rdb_serialization_test.cc + IndexSchemaRDBTest.SaveAndLoad
+ integration/test_saverestore.py (SURVEY.md §4): full round trip across
every index kind, identical search results after restore, doc-id space
preserved verbatim, skip-vector-payload rebuild, and corrupt-file
rejection."""

import numpy as np
import pytest

from valkey_search_tpu.persistence.format import (
    ChunkReader,
    ChunkWriter,
    FormatError,
)
from valkey_search_tpu.server.engine import Engine


def blob(v):
    return np.asarray(v, np.float32).tobytes()


@pytest.fixture()
def populated(rng, tmp_path):
    e = Engine()
    e.execute(
        "FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "doc:",
        "SCHEMA",
        "emb", "VECTOR", "HNSW", "8",
        "TYPE", "FLOAT32", "DIM", "12", "DISTANCE_METRIC", "L2", "M", "8",
        "color", "TAG",
        "price", "NUMERIC",
        "title", "TEXT",
    )
    vecs = rng.standard_normal((120, 12)).astype(np.float32)
    colors = ["red", "green", "blue"]
    titles = ["running fast", "sleeping dog", "quick search engine"]
    for i, v in enumerate(vecs):
        e.hset(f"doc:{i}", {
            "emb": v.tobytes(), "color": colors[i % 3],
            "price": str(i), "title": titles[i % 3],
        })
    # churn: deletes + updates so free ids and tombstones exist
    for i in range(0, 20, 2):
        e.delete(f"doc:{i}")
    for i in range(20, 30):
        e.hset(f"doc:{i}", {"emb": vecs[(i + 50) % 120].tobytes(),
                            "color": "violet", "price": str(1000 + i),
                            "title": "updated document"})
    return e, vecs, str(tmp_path / "ckpt.vstpu")


def _query_suite(e, vecs):
    out = {}
    q = vecs[33].tobytes()
    out["knn"] = e.execute(
        "FT.SEARCH", "idx", "*=>[KNN 10 @emb $q]",
        "PARAMS", "2", "q", q, "NOCONTENT")
    out["hybrid"] = e.execute(
        "FT.SEARCH", "idx", "(@color:{violet})=>[KNN 5 @emb $q]",
        "PARAMS", "2", "q", q, "NOCONTENT")
    out["numeric"] = e.execute(
        "FT.SEARCH", "idx", "@price:[1000 2000]", "NOCONTENT", "LIMIT", "0", "100")
    out["text"] = e.execute("FT.SEARCH", "idx", "updated", "NOCONTENT")
    out["phrase"] = e.execute("FT.SEARCH", "idx", '"search engine"', "NOCONTENT")
    return out


def test_round_trip_identical_results(populated):
    e, vecs, path = populated
    before = _query_suite(e, vecs)
    summary = e.save(path)
    assert summary["schemas"] == 1
    e2 = Engine.load(path)
    after = _query_suite(e2, vecs)
    for name in before:
        assert before[name] == after[name], name


def test_round_trip_preserves_doc_ids(populated):
    e, vecs, path = populated
    e.save(path)
    e2 = Engine.load(path)
    s1 = e.manager.get("idx")
    s2 = e2.manager.get("idx")
    assert dict(s1.interner.items()) == dict(s2.interner.items())
    assert s1.interner.capacity == s2.interner.capacity
    assert s2.mutation_epoch == s1.mutation_epoch


def test_round_trip_keyspace(populated):
    e, vecs, path = populated
    e.save(path)
    e2 = Engine.load(path)
    assert set(e2.keyspace) == set(e.keyspace)
    assert e2.hgetall("doc:21") == e.hgetall("doc:21")
    # bytes values survive
    assert isinstance(e2.keyspace["doc:21"]["emb"], bytes)


def test_restored_engine_accepts_mutations(populated):
    e, vecs, path = populated
    e.save(path)
    e2 = Engine.load(path)
    rng = np.random.default_rng(5)
    nv = rng.standard_normal(12).astype(np.float32)
    e2.hset("doc:999", {"emb": nv.tobytes(), "color": "gold",
                        "price": "7", "title": "brand new"})
    r = e2.execute("FT.SEARCH", "idx", "@color:{gold}", "NOCONTENT")
    assert r == [1, "doc:999"]
    r2 = e2.execute("FT.SEARCH", "idx", "*=>[KNN 1 @emb $q]",
                    "PARAMS", "2", "q", nv.tobytes(), "NOCONTENT")
    assert r2[1] == "doc:999"
    e2.delete("doc:999")
    assert e2.execute("FT.SEARCH", "idx", "@color:{gold}", "NOCONTENT")[0] == 0


def test_skip_vector_payload_rebuilds(populated):
    e, vecs, path = populated
    before = _query_suite(e, vecs)
    e.save(path)
    e2 = Engine.load(path, skip_vector_payload=True)
    after = _query_suite(e2, vecs)
    # non-vector results identical; KNN results equivalent as sets (the
    # rebuilt graph may tie-break differently)
    assert before["numeric"] == after["numeric"]
    assert before["text"] == after["text"]
    assert after["knn"][0] == before["knn"][0]
    assert set(after["hybrid"][1:]) == set(before["hybrid"][1:])


def test_multiple_schemas(tmp_path, rng):
    e = Engine()
    e.execute("FT.CREATE", "a", "ON", "HASH", "PREFIX", "1", "x:",
              "SCHEMA", "v", "VECTOR", "FLAT", "6",
              "TYPE", "FLOAT32", "DIM", "4", "DISTANCE_METRIC", "COSINE")
    e.execute("FT.CREATE", "b", "ON", "HASH", "PREFIX", "1", "y:",
              "SCHEMA", "t", "TAG")
    v = rng.standard_normal(4).astype(np.float32)
    e.hset("x:1", {"v": v.tobytes()})
    e.hset("y:1", {"t": "alpha,beta"})
    p = str(tmp_path / "multi.vstpu")
    e.save(p)
    e2 = Engine.load(p)
    assert e2.execute("FT._LIST") == ["a", "b"]
    r = e2.execute("FT.SEARCH", "a", "*=>[KNN 1 @v $q]",
                   "PARAMS", "2", "q", v.tobytes(), "NOCONTENT")
    assert r[1] == "x:1"
    assert e2.execute("FT.SEARCH", "b", "@t:{beta}", "NOCONTENT") == [1, "y:1"]


def test_corrupt_magic_rejected(tmp_path):
    p = tmp_path / "bad.vstpu"
    p.write_bytes(b"NOTAMAGIC trailing garbage")
    with pytest.raises(FormatError):
        Engine.load(str(p))


def test_truncated_file_rejected(populated):
    e, vecs, path = populated
    e.save(path)
    raw = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(FormatError):
        Engine.load(path)


def test_future_min_version_rejected(tmp_path):
    import struct

    p = tmp_path / "future.vstpu"
    with open(p, "wb") as f:
        f.write(b"VSTPURDB")
        f.write(struct.pack("<II", 99, 99))
        f.write(struct.pack("<I", 0))
    with pytest.raises(FormatError):
        Engine.load(str(p))


def test_chunk_format_large_array_roundtrip(tmp_path, rng):
    # exercise multi-chunk payload streaming (> 4MiB)
    big = rng.standard_normal((1200, 1200)).astype(np.float32)
    p = str(tmp_path / "big.bin")
    with ChunkWriter(p) as w:
        w.section({"type": "t"}, [big, np.arange(7, dtype=np.int32)])
    with ChunkReader(p) as r:
        (meta, arrays), = list(r.sections())
    assert np.array_equal(arrays[0], big)
    assert arrays[1].tolist() == list(range(7))


def test_round_trip_json_schema(tmp_path, rng):
    """ON JSON schemas round-trip: JSONPath attrs, tag arrays, vector field
    (reference: RDB carries the full index_schema proto incl. the
    attribute data type, index_schema.cc SaveIndex/LoadIndex)."""
    import json

    from valkey_search_tpu.persistence.checkpoint import (
        load_engine,
        save_engine,
    )

    e = Engine()
    e.execute(
        "FT.CREATE", "j", "ON", "JSON", "PREFIX", "1", "j:",
        "SCHEMA",
        "$.v", "AS", "v", "VECTOR", "FLAT", "6",
        "TYPE", "FLOAT32", "DIM", "8", "DISTANCE_METRIC", "COSINE",
        "$.tags[*]", "AS", "t", "TAG",
        "$.score", "AS", "s", "NUMERIC",
    )
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    for i, v in enumerate(vecs):
        e.execute("JSON.SET", f"j:{i}", "$", json.dumps({
            "v": [float(x) for x in v],
            "tags": ["a", "b"] if i % 2 else ["c"],
            "score": i,
        }))
    path = str(tmp_path / "j.vstpu")
    save_engine(e, path)
    e2 = load_engine(path)

    q = vecs[7].tobytes()
    for eng in (e, e2):
        r = eng.execute("FT.SEARCH", "j", "(@t:{c})=>[KNN 5 @v $q]",
                        "PARAMS", "2", "q", q, "NOCONTENT")
        assert r == e.execute("FT.SEARCH", "j", "(@t:{c})=>[KNN 5 @v $q]",
                              "PARAMS", "2", "q", q, "NOCONTENT")
    assert (e2.execute("FT.SEARCH", "j", "@s:[10 12]", "NOCONTENT")[0]
            == 3)
    # restored engine keeps indexing new JSON docs
    e2.execute("JSON.SET", "j:new", "$", json.dumps({
        "v": [float(x) for x in vecs[0]], "tags": ["zz"], "score": 999}))
    assert e2.execute("FT.SEARCH", "j", "@t:{zz}", "NOCONTENT")[0] == 1


def test_round_trip_text_suffix_and_fuzzy(tmp_path):
    """TEXT internals (suffix trie, stems, positions) rebuild on load:
    suffix/fuzzy/phrase queries agree before and after."""
    from valkey_search_tpu.persistence.checkpoint import (
        load_engine,
        save_engine,
    )

    e = Engine()
    e.execute("FT.CREATE", "t", "ON", "HASH", "PREFIX", "1", "d:",
              "SCHEMA", "body", "TEXT", "WITHSUFFIXTRIE")
    docs = ["the running dogs", "a dog runs fast", "cats sleeping soundly",
            "fastest runner wins", "sound of silence"]
    for i, b in enumerate(docs):
        e.hset(f"d:{i}", {"body": b})
    path = str(tmp_path / "t.vstpu")
    save_engine(e, path)
    e2 = load_engine(path)
    for q in ("run*", "*ing", "%dogz%", '"dog runs"', "@body:fast"):
        assert (e.execute("FT.SEARCH", "t", q, "NOCONTENT")
                == e2.execute("FT.SEARCH", "t", q, "NOCONTENT")), q


def test_round_trip_preserves_ttl(tmp_path):
    """Keys carrying a TTL keep it across save/restore (reference RDB
    stores expiry; volatile keys must still expire after load)."""
    import time

    from valkey_search_tpu.persistence.checkpoint import (
        load_engine,
        save_engine,
    )

    e = Engine()
    e.hset("k1", {"f": "v"})
    e.hset("k2", {"f": "v"})
    e.execute("EXPIRE", "k1", "100")
    path = str(tmp_path / "ttl.vstpu")
    save_engine(e, path)
    e2 = load_engine(path)
    ttl = int(e2.execute("TTL", "k1"))
    assert 1 <= ttl <= 100
    assert int(e2.execute("TTL", "k2")) == -1
