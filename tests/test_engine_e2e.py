"""End-to-end engine tests: FT.CREATE → HSET → FT.SEARCH over the full stack."""

import numpy as np
import pytest

from valkey_search_tpu.server.engine import Engine


def blob(v):
    return np.asarray(v, np.float32).tobytes()


@pytest.fixture()
def eng():
    return Engine()


@pytest.fixture()
def vec_eng(rng):
    """Engine with an HNSW index and 300 documents with tags + numerics."""
    e = Engine()
    e.execute(
        "FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "doc:",
        "SCHEMA",
        "emb", "VECTOR", "HNSW", "8",
        "TYPE", "FLOAT32", "DIM", "16", "DISTANCE_METRIC", "L2", "M", "8",
        "color", "TAG",
        "price", "NUMERIC",
    )
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    colors = ["red", "green", "blue"]
    for i, v in enumerate(vecs):
        e.hset(
            f"doc:{i}",
            {"emb": v.tobytes(), "color": colors[i % 3], "price": str(i)},
        )
    return e, vecs


def test_create_info_list_drop(eng):
    eng.execute(
        "FT.CREATE", "myidx", "SCHEMA", "f", "NUMERIC", "t", "TAG"
    )
    assert eng.ft_list() == ["myidx"]
    info = eng.ft_info("myidx")
    d = {info[i]: info[i + 1] for i in range(0, len(info), 2)}
    assert d["index_name"] == "myidx"
    assert d["num_docs"] == 0
    eng.ft_dropindex("myidx")
    assert eng.ft_list() == []


def test_duplicate_index_rejected(eng):
    eng.execute("FT.CREATE", "i", "SCHEMA", "f", "NUMERIC")
    with pytest.raises(Exception):
        eng.execute("FT.CREATE", "i", "SCHEMA", "f", "NUMERIC")


def test_backfill_indexes_existing_keys(eng):
    eng.hset("doc:1", {"n": "5"})
    eng.hset("doc:2", {"n": "50"})
    eng.hset("other:1", {"n": "7"})  # prefix mismatch
    eng.execute(
        "FT.CREATE", "i", "PREFIX", "1", "doc:", "SCHEMA", "n", "NUMERIC"
    )
    res = eng.ft_search("i", "@n:[0 100]")
    assert res[0] == 2
    assert set(res[1::1][0::2]) <= {"doc:1", "doc:2"} or True
    keys = [r for r in res[1:] if isinstance(r, str)]
    assert set(keys) == {"doc:1", "doc:2"}


def test_skipinitialscan(eng):
    eng.hset("doc:1", {"n": "5"})
    eng.execute(
        "FT.CREATE", "i", "PREFIX", "1", "doc:", "SKIPINITIALSCAN",
        "SCHEMA", "n", "NUMERIC",
    )
    assert eng.ft_search("i", "@n:[0 100]")[0] == 0
    eng.hset("doc:2", {"n": "7"})  # post-create mutations indexed
    assert eng.ft_search("i", "@n:[0 100]")[0] == 1


def test_pure_vector_knn(vec_eng):
    e, vecs = vec_eng
    res = e.ft_search(
        "idx", "*=>[KNN 5 @emb $q]", "PARAMS", "2", "q", blob(vecs[17]),
        "NOCONTENT",
    )
    assert res[0] == 5
    assert res[1] == "doc:17"  # exact self-match first


def test_knn_reply_contains_score(vec_eng):
    e, vecs = vec_eng
    res = e.ft_search(
        "idx", "*=>[KNN 3 @emb $q AS dist]", "PARAMS", "2", "q", blob(vecs[4]),
    )
    assert res[0] == 3
    assert res[1] == "doc:4"
    pairs = res[2]
    d = {pairs[i]: pairs[i + 1] for i in range(0, len(pairs), 2)}
    assert float(d["dist"]) == pytest.approx(0.0, abs=1e-4)
    assert d["color"] == "green"  # 4 % 3 == 1


def test_hybrid_inline_filter(vec_eng):
    e, vecs = vec_eng
    res = e.ft_search(
        "idx", "@color:{red}=>[KNN 10 @emb $q]",
        "PARAMS", "2", "q", blob(vecs[30]),
        "NOCONTENT",
    )
    keys = res[1:]
    assert res[0] > 0
    assert all(int(k.split(":")[1]) % 3 == 0 for k in keys)  # red == i%3==0


def test_hybrid_prefilter_selective(vec_eng):
    e, vecs = vec_eng
    # price in [10, 13] → 4 docs → prefilter path (very selective)
    res = e.ft_search(
        "idx", "@price:[10 13]=>[KNN 10 @emb $q]",
        "PARAMS", "2", "q", blob(vecs[11]),
        "NOCONTENT",
    )
    keys = set(res[1:])
    assert keys == {"doc:10", "doc:11", "doc:12", "doc:13"}
    assert res[1] == "doc:11"  # nearest first


def test_hybrid_and_or_negate(vec_eng):
    e, vecs = vec_eng
    res = e.ft_search(
        "idx", "(@color:{red|green} -@price:[100 +inf])=>[KNN 50 @emb $q]",
        "PARAMS", "2", "q", blob(vecs[0]), "NOCONTENT",
    )
    for k in res[1:]:
        i = int(k.split(":")[1])
        assert i % 3 in (0, 1) and i < 100


def test_non_vector_query_and_limit(vec_eng):
    e, _ = vec_eng
    res = e.ft_search("idx", "@price:[0 19]", "NOCONTENT", "LIMIT", "0", "100")
    assert res[0] == 20
    assert len(res[1:]) == 20
    res = e.ft_search("idx", "@price:[0 19]", "NOCONTENT", "LIMIT", "5", "5")
    assert res[0] == 20 and len(res[1:]) == 5


def test_sortby_numeric_field(vec_eng):
    e, _ = vec_eng
    res = e.ft_search(
        "idx", "@price:[10 15]", "SORTBY", "price", "DESC",
        "RETURN", "1", "price",
    )
    prices = [float(pair[1]) for pair in res[2::2]]
    assert prices == sorted(prices, reverse=True)


def test_sortby_nocontent_still_sorts(vec_eng):
    # NOCONTENT must not starve SORTBY of its key: the sort field comes
    # from document content (reference sorts resolved rows before shaping)
    e, _ = vec_eng
    res = e.ft_search(
        "idx", "@price:[10 15]", "SORTBY", "price", "DESC", "NOCONTENT",
    )
    ids = [int(k.split(":")[1]) for k in res[1:]]
    assert ids == sorted(ids, reverse=True) and len(ids) == 6


def test_aggregate_groupby_implicit_load(vec_eng):
    # GROUPBY/REDUCE properties resolve from document content without an
    # explicit LOAD (reference registers every parsed @field and fills it
    # in CreateRecordsFromNeighbors)
    e, _ = vec_eng
    res = e.execute(
        "FT.AGGREGATE", "idx", "@price:[0 29]",
        "GROUPBY", "1", "@color", "REDUCE", "SUM", "1", "@price", "AS", "s",
    )
    rows = {tuple(r[:2]): dict(zip(r[::2], r[1::2])) for r in res[1:]}
    assert res[0] == 3  # red/green/blue from i%3
    total = sum(float(m["s"]) for m in rows.values())
    assert total == sum(range(30))


def test_return_fields_with_as(vec_eng):
    e, _ = vec_eng
    res = e.ft_search(
        "idx", "@price:[3 3]", "RETURN", "1", "color", "AS", "c"
    )
    assert res[0] == 1 and res[1] == "doc:3"
    assert res[2] == ["c", "red"]


def test_delete_removes_from_index(vec_eng):
    e, vecs = vec_eng
    e.delete("doc:17")
    res = e.ft_search(
        "idx", "*=>[KNN 3 @emb $q]", "PARAMS", "2", "q", blob(vecs[17]),
        "NOCONTENT",
    )
    assert "doc:17" not in res[1:]


def test_update_moves_doc(vec_eng):
    e, vecs = vec_eng
    e.hset("doc:5", {"emb": blob(vecs[200]), "color": "purple", "price": "5"})
    res = e.ft_search(
        "idx", "@color:{purple}=>[KNN 1 @emb $q]",
        "PARAMS", "2", "q", blob(vecs[200]), "NOCONTENT",
    )
    assert res[1] == "doc:5"


def test_invalid_vector_drops_doc(vec_eng):
    e, vecs = vec_eng
    e.hset("doc:9", {"emb": b"\x01\x02", "color": "red", "price": "9"})  # bad blob
    res = e.ft_search("idx", "@price:[9 9]", "NOCONTENT")
    assert res[0] == 0  # Redisearch compat: invalid data removes key entirely


def test_flat_index_e2e(rng):
    e = Engine()
    e.execute(
        "FT.CREATE", "f", "SCHEMA", "v", "VECTOR", "FLAT", "6",
        "TYPE", "FLOAT32", "DIM", "8", "DISTANCE_METRIC", "COSINE",
    )
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    for i, v in enumerate(vecs):
        e.hset(f"k{i}", {"v": v.tobytes()})
    res = e.ft_search(
        "f", "*=>[KNN 3 @v $q]", "PARAMS", "2", "q", blob(vecs[31] * 2.0),
        "NOCONTENT",
    )
    assert res[1] == "k31"


def test_match_all_non_vector(vec_eng):
    e, _ = vec_eng
    res = e.ft_search("idx", "*", "NOCONTENT", "LIMIT", "0", "1000")
    assert res[0] == 300


def test_copy_indexes_destination():
    """COPY must index the destination like a fresh write (reference
    integration/test_copy.py)."""
    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    e.execute("FT.CREATE", "ci", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    e.hset("k:src", {"t": "gold"})
    assert e.execute("COPY", "k:src", "k:dst") == 1
    r = e.execute("FT.SEARCH", "ci", "@t:{gold}", "NOCONTENT")
    assert r[0] == 2 and {x if isinstance(x, str) else x.decode()
                          for x in r[1:]} == {"k:src", "k:dst"}
    # no-replace refuses; REPLACE overwrites and reindexes
    e.hset("k:other", {"t": "silver"})
    assert e.execute("COPY", "k:other", "k:dst") == 0
    assert e.execute("COPY", "k:other", "k:dst", "REPLACE") == 1
    r = e.execute("FT.SEARCH", "ci", "@t:{gold}", "NOCONTENT")
    assert r[0] == 1
    r = e.execute("FT.SEARCH", "ci", "@t:{silver}", "NOCONTENT")
    assert r[0] == 2
    # missing source
    assert e.execute("COPY", "k:ghost", "k:x") == 0
