"""Batched device HNSW search: recall + parity vs the native CPU oracle.

Pins search.hnsw-scan-threshold to 0 so the batched GRAPH traversal is
what runs (the product planner serves small corpora via the exact scan
— covered by the engine e2e tests)."""

import pytest as _pytest

from valkey_search_tpu.runtime import config as _config


@_pytest.fixture(autouse=True)
def _force_graph_path():
    _config.set_config("search.hnsw-scan-threshold", 0)
    yield
    _config.REGISTRY.reset_all()


import numpy as np
import jax.numpy as jnp
import pytest

from valkey_search_tpu.indexes.base import RecordResult
from valkey_search_tpu.indexes.hnsw import HnswVectorIndex


N, D = 1500, 24


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    return rng.standard_normal((N, D)).astype(np.float32)


@pytest.fixture(scope="module")
def index(corpus):
    idx = HnswVectorIndex(dim=D, m=12, ef_construction=80, seed=3)
    for i, v in enumerate(corpus):
        idx.add_record(f"doc:{i}", v)
    return idx


def brute_ids(q, corpus, k):
    d = ((corpus - q) ** 2).sum(-1)
    return np.argsort(d)[:k]


def test_device_recall_vs_brute(index, corpus):
    rng = np.random.default_rng(2)
    queries = rng.standard_normal((32, D)).astype(np.float32)
    d, docs = index.search_batch(queries, k=10, ef=80)
    hits = 0
    for b, q in enumerate(queries):
        want = set(brute_ids(q, corpus, 10).tolist())
        hits += len(want & set(int(x) for x in docs[b] if x >= 0))
    recall = hits / (10 * len(queries))
    assert recall >= 0.95, f"recall {recall}"


def test_device_matches_cpu_oracle(index, corpus):
    """Same graph, same ef → device results ≈ native oracle results."""
    rng = np.random.default_rng(4)
    queries = rng.standard_normal((16, D)).astype(np.float32)
    d_dev, docs_dev = index.search_batch(queries, k=10, ef=64)
    agree = total = 0
    for b, q in enumerate(queries):
        _, cpu_nodes = index.builder.search(q, k=10, ef=64)
        cpu_docs = {int(index._node_doc[n]) for n in cpu_nodes}
        dev_docs = {int(x) for x in docs_dev[b] if x >= 0}
        agree += len(cpu_docs & dev_docs)
        total += len(cpu_docs)
    # identical algorithm; tiny divergence possible from fp ordering ties
    assert agree / total >= 0.98, f"oracle agreement {agree/total}"


def test_self_lookup(index, corpus):
    d, docs = index.search_batch(corpus[7:8], k=1, ef=40)
    assert index.interner.key_of(int(docs[0, 0])) == "doc:7"
    assert d[0, 0] == pytest.approx(0.0, abs=1e-4)


def test_update_replaces_old_vector(index, corpus):
    idx = HnswVectorIndex(dim=D, m=8, ef_construction=60)
    for i in range(200):
        idx.add_record(f"k{i}", corpus[i])
    far = corpus[500]
    assert idx.add_record("k0", far) is RecordResult.MODIFIED
    d, docs = idx.search_batch(far[None], k=1, ef=60)
    assert idx.interner.key_of(int(docs[0, 0])) == "k0"
    assert d[0, 0] == pytest.approx(0.0, abs=1e-4)
    # old location must not surface k0 anymore
    d2, docs2 = idx.search_batch(corpus[0][None], k=3, ef=60)
    keys = [idx.interner.key_of(int(x)) for x in docs2[0] if x >= 0]
    assert "k0" not in keys or not np.isclose(d2[0][keys.index("k0")], 0, atol=1e-4)


def test_remove_record(index, corpus):
    idx = HnswVectorIndex(dim=D, m=8, ef_construction=60)
    for i in range(100):
        idx.add_record(f"k{i}", corpus[i])
    idx.remove_record("k42")
    d, docs = idx.search_batch(corpus[42][None], k=5, ef=60)
    keys = {idx.interner.key_of(int(x)) for x in docs[0] if x >= 0}
    assert "k42" not in keys


def test_inline_filter(index, corpus):
    cap = index.interner.capacity
    allowed = np.zeros(max(cap, 1), bool)
    allowed[:100] = True  # only docs 0..99 allowed
    q = corpus[500]  # query near a disallowed doc
    d, docs = index.search_batch(q[None], k=10, filter_mask=jnp.asarray(allowed), ef=100)
    got = [int(x) for x in docs[0] if x >= 0]
    assert got, "filter returned nothing"
    assert all(g < 100 for g in got)


def test_exact_prefilter_path(index, corpus):
    cap = index.interner.capacity
    allowed = np.zeros(max(cap, 1), bool)
    chosen = [3, 77, 500, 901]
    for c in chosen:
        allowed[c] = True
    q = corpus[901]
    d, docs = index.exact_search_batch(q[None], k=4, filter_mask=jnp.asarray(allowed))
    got = [int(x) for x in docs[0] if x >= 0]
    assert got[0] == 901
    assert set(got) == set(chosen)


def test_empty_index_search():
    idx = HnswVectorIndex(dim=8)
    d, docs = idx.search_batch(np.zeros((1, 8), np.float32), k=5)
    assert (docs == -1).all()


def test_cosine_hnsw(corpus):
    idx = HnswVectorIndex(dim=D, metric="cosine", m=8, ef_construction=60)
    for i in range(300):
        idx.add_record(f"c{i}", corpus[i])
    v = corpus[25] * 7.0  # scaled → cosine distance 0
    d, docs = idx.search_batch(v[None], k=1, ef=50)
    assert idx.interner.key_of(int(docs[0, 0])) == "c25"
    assert d[0, 0] == pytest.approx(0.0, abs=1e-4)


def test_incremental_graph_publish(rng):
    """Mutations between publishes scatter-update the device mirror
    instead of re-exporting O(N); results stay identical to a fresh
    full publish."""
    import numpy as np

    from valkey_search_tpu.indexes.hnsw import HnswVectorIndex
    from valkey_search_tpu.runtime.metrics import STATS

    n, d, k = 600, 16, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswVectorIndex(dim=d, m=8, ef_construction=50, seed=3)
    for i in range(n):
        idx.add_record(f"k{i}", vecs[i])
    idx.device_graph()  # full publish
    full = STATS.get("hnsw_graph_publishes")

    # small mutation batch → incremental
    idx.add_record("k17", vecs[17] + 0.001)      # update (tombstone+insert)
    idx.remove_record("k23")
    idx.add_record(f"k{n}", vecs[0] * 0.5)
    inc0 = STATS.get("hnsw_graph_incremental_publishes")
    g = idx.device_graph()
    assert STATS.get("hnsw_graph_incremental_publishes") == inc0 + 1
    assert STATS.get("hnsw_graph_publishes") == full  # no full re-export

    d1, docs1 = idx.search_batch(vecs[:8], k, ef=60)
    # oracle: force a full publish and compare results
    idx._device_graph = None
    idx._graph_dirty = True
    idx.builder.clear_dirty()
    d2, docs2 = idx.search_batch(vecs[:8], k, ef=60)
    np.testing.assert_array_equal(docs1, docs2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    # deleted key never returned
    assert (docs1 != idx.interner.intern("k23")).all()
