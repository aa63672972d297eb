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


def test_aos_traversal_recall_parity(rng):
    """The AoS int8 fast-path traversal must match the SoA kernel's
    recall against brute force (int8 walk + exact fp32 rescore)."""
    from valkey_search_tpu.indexes.hnsw import HnswVectorIndex
    from valkey_search_tpu.ops import hnsw_search as hs
    from valkey_search_tpu.runtime import config
    import jax.numpy as jnp

    n, d = 4000, 32
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswVectorIndex(dim=d, m=16, ef_construction=100, seed=3)
    idx.bulk_load([f"k{i}" for i in range(n)], corpus)
    graph = idx.device_graph()
    aos = hs.build_aos_tables(graph)
    queries = rng.standard_normal((32, d)).astype(np.float32)

    gt = []
    for q in queries:
        dd = ((corpus - q) ** 2).sum(1)
        gt.append(set(np.argpartition(dd, 10)[:10].tolist()))

    d_aos, i_aos = hs.hnsw_search_batch_aos(
        graph, aos, jnp.asarray(queries), k=10, ef=100,
    )
    d_soa, i_soa = hs.hnsw_search_batch(
        graph, jnp.asarray(queries), k=10, ef=100, metric="l2",
        precision="highest",
    )
    def recall(ids):
        ids = np.asarray(ids)
        # node id == corpus row (bulk_load order)
        return np.mean([
            len(set(ids[b].tolist()) & gt[b]) / 10
            for b in range(len(queries))
        ])
    r_aos, r_soa = recall(i_aos), recall(i_soa)
    assert r_aos >= 0.95, r_aos
    assert r_aos >= r_soa - 0.05, (r_aos, r_soa)
    # distances are exact fp32 after the rescore
    row = np.asarray(i_aos)[0, 0]
    want = float(((corpus[row] - queries[0]) ** 2).sum())
    assert abs(float(np.asarray(d_aos)[0, 0]) - want) < 1e-2


def test_aos_path_routed_and_budget_gated(rng):
    from valkey_search_tpu.indexes.hnsw import HnswVectorIndex
    from valkey_search_tpu.runtime import config

    n, d = 1500, 16
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswVectorIndex(dim=d, m=8, ef_construction=60, seed=1)
    idx.bulk_load([f"k{i}" for i in range(n)], corpus)
    config.set_config("search.hnsw-scan-threshold", 0)  # force traversal
    try:
        dists, docs = idx.search_batch(corpus[:4], k=5, ef=60)
        assert docs[0, 0] == idx.interner.lookup("k0")
        assert idx._aos_tables is not None  # fast path built the mirror
        # budget too small -> falls back to the SoA kernel
        idx._aos_tables = None
        idx._aos_for_epoch = -1
        config.set_config("search.hnsw-aos-budget-bytes", 1)
        d2, docs2 = idx.search_batch(corpus[:4], k=5, ef=60)
        assert idx._aos_tables is None
        assert docs2[0, 0] == docs[0, 0]
    finally:
        config.REGISTRY.reset_all()


def test_aos_traversal_excludes_deleted(rng):
    from valkey_search_tpu.indexes.hnsw import HnswVectorIndex
    from valkey_search_tpu.runtime import config

    n, d = 1200, 16
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswVectorIndex(dim=d, m=8, ef_construction=60, seed=2)
    idx.bulk_load([f"k{i}" for i in range(n)], corpus)
    idx.remove_record("k7")
    config.set_config("search.hnsw-scan-threshold", 0)
    try:
        _, docs = idx.search_batch(corpus[7:8], k=3, ef=60)
        assert idx.interner.lookup("k7") is None or (
            idx.interner.lookup("k7") not in docs[0].tolist()
        )
    finally:
        config.REGISTRY.reset_all()


def test_vacuum_reclaims_tombstones_and_preserves_results(rng):
    """Churned index: vacuum rebuilds without tombstones, keeps doc ids
    stable, and search results are unchanged (reference
    allow_replace_deleted + reclaimable-memory coverage)."""
    from valkey_search_tpu.indexes.hnsw import HnswVectorIndex
    from valkey_search_tpu.runtime import config

    n, d = 1200, 16
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswVectorIndex(dim=d, m=8, ef_construction=50, seed=9)
    for i in range(n):
        idx.add_record(f"k{i}", corpus[i])
    # churn: delete a third, re-add half of those with new vectors
    for i in range(0, n, 3):
        idx.remove_record(f"k{i}")
    for i in range(0, n, 6):
        corpus[i] = rng.standard_normal(d).astype(np.float32)
        idx.add_record(f"k{i}", corpus[i])
    live_keys = {f"k{i}" for i in range(n)} - {
        f"k{i}" for i in range(0, n, 3) if i % 6 != 0
    }
    before_nodes = idx.builder.count
    assert idx.deleted_count() > 0
    assert idx.reclaimable_bytes() > 0
    config.set_config("search.hnsw-scan-threshold", 0)  # force traversal
    try:
        d_before, docs_before = idx.search_batch(corpus[:8], k=5, ef=60)
        reclaimed = idx.vacuum(force=True)
        assert reclaimed > 0
        assert idx.builder.count == len(live_keys)
        assert idx.deleted_count() == 0
        assert idx.reclaimable_bytes() == 0
        d_after, docs_after = idx.search_batch(corpus[:8], k=5, ef=60)
        # self-lookup still exact for live keys, doc ids preserved
        for b in (1, 2, 4, 5):  # k1,k2,k4,k5 live
            assert docs_after[b, 0] == idx.interner.lookup(f"k{b}")
        # distances agree with pre-vacuum results (same live set)
        np.testing.assert_allclose(
            np.asarray(d_after), np.asarray(d_before), rtol=1e-3, atol=1e-4,
        )
    finally:
        config.REGISTRY.reset_all()


def test_cron_auto_vacuum(rng):
    from valkey_search_tpu.runtime import config
    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    e.execute("FT.CREATE", "vac", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "emb", "VECTOR", "HNSW", "6",
              "TYPE", "FLOAT32", "DIM", "8", "DISTANCE_METRIC", "L2")
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    for i in range(40):
        e.hset(f"k:{i}", {"emb": vecs[i].tobytes()})
    for i in range(0, 40, 2):
        e.delete(f"k:{i}")  # 50% tombstones
    idx = e.manager.get("vac").attributes["emb"].index
    assert idx.deleted_count() == 20
    stats = e.cron()
    assert stats.get("vacuumed", 0) >= 20
    assert idx.deleted_count() == 0
    r = e.execute("FT.SEARCH", "vac", "*=>[KNN 3 @emb $q]",
                  "PARAMS", "2", "q", vecs[1].tobytes(), "NOCONTENT")
    keys = [x if isinstance(x, str) else x.decode() for x in r[1:]]
    assert "k:1" in keys


def test_scan_seeded_traversal_recall(rng):
    """Seeded mode: subsample-scan beam init + graph refinement must hold
    recall@10 >= pure traversal on the same graph."""
    from valkey_search_tpu.indexes.hnsw import HnswVectorIndex
    from valkey_search_tpu.ops import hnsw_search as hs
    import jax.numpy as jnp

    n, d = 4000, 32
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswVectorIndex(dim=d, m=16, ef_construction=100, seed=5)
    idx.bulk_load([f"k{i}" for i in range(n)], corpus)
    graph = idx.device_graph()
    aos = hs.build_aos_tables(graph)
    queries = rng.standard_normal((16, d)).astype(np.float32)
    gt = []
    for q in queries:
        dd = ((corpus - q) ** 2).sum(1)
        gt.append(set(np.argpartition(dd, 10)[:10].tolist()))

    def recall(ids):
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[b].tolist()) & gt[b]) / 10 for b in range(16)
        ])

    _, i_pure = hs.hnsw_search_batch_aos(
        graph, aos, jnp.asarray(queries), k=10, ef=100)
    _, i_seed = hs.hnsw_search_batch_aos(
        graph, aos, jnp.asarray(queries), k=10, ef=100, seed_stride=16)
    r_pure, r_seed = recall(i_pure), recall(i_seed)
    assert r_seed >= 0.95, r_seed
    assert r_seed >= r_pure - 0.03, (r_pure, r_seed)


def test_projected_aos_traversal_recall(rng):
    """dp-projected walk + exact rescore: recall must stay >= 0.95 at
    ef=100 with dp = d/2 (the gather-bandwidth saver)."""
    from valkey_search_tpu.indexes.hnsw import HnswVectorIndex
    from valkey_search_tpu.ops import hnsw_search as hs
    import jax.numpy as jnp

    n, d = 4000, 64
    # clustered corpus (real embeddings concentrate variance; isotropic
    # gaussian is the adversarial case where ANY projection loses order)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 4
    corpus = centers[rng.integers(0, 64, n)] + \
        rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswVectorIndex(dim=d, m=16, ef_construction=100, seed=4)
    idx.bulk_load([f"k{i}" for i in range(n)], corpus)
    graph = idx.device_graph()
    aos32 = hs.build_aos_tables(graph, project_dim=32)
    assert aos32.proj is not None and aos32.nbr_vecs_q.shape[-1] == 32
    queries = centers[rng.integers(0, 64, 16)] + \
        rng.standard_normal((16, d)).astype(np.float32)
    gt = []
    for q in queries:
        dd = ((corpus - q) ** 2).sum(1)
        gt.append(set(np.argpartition(dd, 10)[:10].tolist()))
    _, ids = hs.hnsw_search_batch_aos(
        graph, aos32, jnp.asarray(queries), k=10, ef=100)
    ids = np.asarray(ids)
    rec = np.mean([
        len(set(ids[b].tolist()) & gt[b]) / 10 for b in range(16)
    ])
    assert rec >= 0.92, rec
    # distances come from the exact full-space rescore
    row = ids[0, 0]
    want = float(((corpus[row] - queries[0]) ** 2).sum())
    d_out, _ = hs.hnsw_search_batch_aos(
        graph, aos32, jnp.asarray(queries), k=10, ef=100)
    assert abs(float(np.asarray(d_out)[0, 0]) - want) < 1e-2
