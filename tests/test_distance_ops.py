"""Distance kernel semantics vs numpy references (hnswlib space semantics)."""

import numpy as np
import jax.numpy as jnp

from valkey_search_tpu.ops import distance as dist_ops


def np_l2(q, c):
    return ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)


def np_ip(q, c):
    return 1.0 - q @ c.T


def test_l2_matches_numpy(rng):
    q = rng.standard_normal((7, 33)).astype(np.float32)
    c = rng.standard_normal((50, 33)).astype(np.float32)
    got = np.asarray(dist_ops.pairwise_scores(jnp.asarray(q), jnp.asarray(c), "l2"))
    np.testing.assert_allclose(got, np_l2(q, c), rtol=1e-4, atol=1e-4)


def test_ip_matches_numpy(rng):
    q = rng.standard_normal((4, 16)).astype(np.float32)
    c = rng.standard_normal((9, 16)).astype(np.float32)
    got = np.asarray(dist_ops.pairwise_scores(jnp.asarray(q), jnp.asarray(c), "ip"))
    np.testing.assert_allclose(got, np_ip(q, c), rtol=1e-5, atol=1e-5)


def test_cosine_on_normalized_equals_ip(rng):
    q = rng.standard_normal((3, 8)).astype(np.float32)
    qn, _ = dist_ops.normalize_rows(jnp.asarray(q))
    c = rng.standard_normal((5, 8)).astype(np.float32)
    cn, mags = dist_ops.normalize_rows(jnp.asarray(c))
    got = np.asarray(dist_ops.pairwise_scores(qn, cn, "cosine"))
    # manual cosine distance
    qn_np = q / np.linalg.norm(q, axis=1, keepdims=True)
    cn_np = c / np.linalg.norm(c, axis=1, keepdims=True)
    np.testing.assert_allclose(got, 1.0 - qn_np @ cn_np.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mags), np.linalg.norm(c, axis=1), rtol=1e-5
    )


def test_batched_candidate_scores_l2(rng):
    q = rng.standard_normal((5, 12)).astype(np.float32)
    cands = rng.standard_normal((5, 7, 12)).astype(np.float32)
    got = np.asarray(
        dist_ops.batched_candidate_scores(jnp.asarray(q), jnp.asarray(cands), "l2")
    )
    want = np.stack([np_l2(q[b : b + 1], cands[b])[0] for b in range(5)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
