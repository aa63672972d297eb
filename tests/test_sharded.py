"""Sharded (cluster-mode) search over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from valkey_search_tpu.parallel import mesh as pm
from valkey_search_tpu.parallel.fanout import ShardedHnswIndex


def test_sharded_flat_matches_brute_force(rng):
    mesh = pm.make_mesh(8)
    corpus = rng.standard_normal((8 * 512, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    d, i, vv = pm.sharded_flat_topk(mesh, jnp.asarray(corpus), jnp.asarray(q), k=5)
    dd = ((q[:, None, :] - corpus[None, :, :]) ** 2).sum(-1)
    want = np.argsort(dd, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want)
    assert np.asarray(vv)[0] == np.asarray(vv)[1]


def test_sharded_batch_update(rng):
    mesh = pm.make_mesh(4)
    corpus = rng.standard_normal((4 * 256, 8)).astype(np.float32)
    target = rng.standard_normal((2, 8)).astype(np.float32)
    upd = pm.sharded_batch_update(
        mesh, jnp.asarray(corpus), jnp.asarray([3, 700], jnp.int32),
        jnp.asarray(target),
    )
    upd = np.asarray(upd)
    np.testing.assert_allclose(upd[3], target[0], rtol=1e-6)
    np.testing.assert_allclose(upd[700], target[1], rtol=1e-6)
    # untouched rows identical
    np.testing.assert_array_equal(upd[4], corpus[4])


@pytest.fixture(scope="module")
def sharded_index():
    rng = np.random.default_rng(123)
    corpus = rng.standard_normal((1200, 16)).astype(np.float32)
    idx = ShardedHnswIndex(
        dim=16, m=8, ef_construction=60, mesh=pm.make_mesh(4)
    )
    for i, v in enumerate(corpus):
        idx.add_record(f"k{i}", v)
    return idx, corpus


def test_sharded_hnsw_recall(sharded_index, rng):
    idx, corpus = sharded_index
    queries = rng.standard_normal((8, 16)).astype(np.float32)
    d, docs = idx.search_batch(queries, k=10, ef=80)
    hits = 0
    for b, q in enumerate(queries):
        dd = ((corpus - q) ** 2).sum(-1)
        want = {
            idx.interner.lookup(f"k{j}") for j in np.argsort(dd)[:10]
        }
        hits += len(want & {int(x) for x in docs[b] if x >= 0})
    assert hits / 80 >= 0.9, f"sharded recall {hits/80}"


def test_sharded_self_lookup(sharded_index):
    idx, corpus = sharded_index
    d, docs = idx.search_batch(corpus[99][None], k=1, ef=60)
    assert idx.interner.key_of(int(docs[0, 0])) == "k99"
    assert d[0, 0] == pytest.approx(0.0, abs=1e-4)


def test_sharded_remove(sharded_index):
    idx, corpus = sharded_index
    idx.remove_record("k99")
    d, docs = idx.search_batch(corpus[99][None], k=5, ef=60)
    keys = {idx.interner.key_of(int(x)) for x in docs[0] if x >= 0}
    assert "k99" not in keys


def test_sharded_filter(sharded_index):
    idx, corpus = sharded_index
    cap = idx.interner.capacity
    allowed = np.zeros(cap, bool)
    docs_allowed = {idx.interner.lookup(f"k{i}") for i in range(50)}
    for d0 in docs_allowed:
        allowed[d0] = True
    d, docs = idx.search_batch(
        corpus[500][None], k=10, ef=100, filter_mask=jnp.asarray(allowed)
    )
    got = {int(x) for x in docs[0] if x >= 0}
    assert got and got <= docs_allowed


def test_shard_distribution(sharded_index):
    idx, _ = sharded_index
    counts = [s.count() for s in idx.shards]
    assert sum(counts) == 1199  # one removed
    assert min(counts) > 0


def test_sharded_two_stage_matches_exact(rng):
    mesh8 = pm.make_mesh(8)
    d = 16
    corpus = rng.standard_normal((8 * 64, d)).astype("float32")
    queries = rng.standard_normal((6, d)).astype("float32")
    de, ie, _ = pm.sharded_flat_topk(
        mesh8, jnp.asarray(corpus), jnp.asarray(queries), k=5
    )
    dt, it, _ = pm.sharded_flat_topk(
        mesh8, jnp.asarray(corpus), jnp.asarray(queries), k=5, two_stage=True
    )
    # tiny shards: coarse covers everything → identical ids
    assert np.array_equal(np.asarray(ie), np.asarray(it))
    assert np.allclose(np.asarray(de), np.asarray(dt), atol=1e-4)
