"""Async ingestion: mutation queue combine, drain, engine integration."""

import numpy as np

from valkey_search_tpu.schema.index_schema import IndexSchema
from valkey_search_tpu.schema.ingestion import IngestionEngine
from valkey_search_tpu.server.engine import Engine


def test_combine_and_apply():
    s = IndexSchema("i")
    s.add_numeric_attribute("n")
    q = IngestionEngine(num_workers=1)
    for v in range(50):
        q.enqueue_upsert(s, "k", {"n": str(v)})
    assert q.drain(timeout=10)
    assert s.attributes["n"].index.value_of("k") == 49  # latest wins
    q.shutdown()


def test_delete_after_upsert():
    s = IndexSchema("i")
    s.add_numeric_attribute("n")
    q = IngestionEngine(num_workers=2)
    q.enqueue_upsert(s, "a", {"n": "1"})
    q.enqueue_upsert(s, "b", {"n": "2"})
    q.enqueue_delete(s, "a")
    assert q.drain(timeout=10)
    assert s.attributes["n"].index.value_of("a") is None
    assert s.attributes["n"].index.value_of("b") == 2
    q.shutdown()


def test_async_engine_end_to_end(rng):
    e = Engine(sync_ingest=False)
    e.execute(
        "FT.CREATE", "i", "SCHEMA",
        "v", "VECTOR", "HNSW", "6", "TYPE", "FLOAT32", "DIM", "8",
        "DISTANCE_METRIC", "L2",
        "n", "NUMERIC",
    )
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    for i, v in enumerate(vecs):
        e.hset(f"k{i}", {"v": v.tobytes(), "n": str(i)})
    e.drain()
    res = e.ft_search(
        "i", "@n:[20 29]=>[KNN 3 @v $q]",
        "PARAMS", "2", "q", vecs[25].tobytes(), "NOCONTENT",
    )
    assert res[1] == "k25"
    info = e.ft_info("i")
    d = dict(zip(info[::2], info[1::2]))
    assert d["num_docs"] == 100
    assert d["mutation_queue_size"] == 0
