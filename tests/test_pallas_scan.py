"""Fused Pallas coarse-scan kernel vs its XLA oracle + end-to-end recall.

Runs the kernel in interpret mode on the CPU test mesh (tests/conftest.py
pins JAX_PLATFORMS=cpu); the compiled-TPU path is exercised by the bench
and the driver's TPU drive.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from valkey_search_tpu.ops import pallas_scan as ps
from valkey_search_tpu.ops import topk as topk_ops


def _mk(rng, b, n, d):
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    return (
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(c, jnp.bfloat16),
        q,
        c,
    )


@pytest.mark.parametrize("positive", [True, False])
def test_kernel_matches_reference(rng, positive):
    b, n, d = 16, ps.GROUP, 128
    _, c_lp, q, c = _mk(rng, b, n, d)
    q_lp = jnp.asarray(-2.0 * q, jnp.bfloat16)  # alpha pre-folded
    qsq = (
        jnp.asarray((q ** 2).sum(1, keepdims=True))
        if positive
        else jnp.zeros((b, 1), jnp.float32)
    )
    bias = jnp.asarray(((c.astype(np.float32) ** 2).sum(1))[None, :])
    vals, idx = ps.bucket_min_scan(
        q_lp, qsq, c_lp, bias, positive=positive, block_b=8, interpret=True
    )
    rvals, ridx = ps.bucket_min_scan_reference(q_lp, qsq, c_lp, bias)
    # the kernel quantizes low 7 mantissa bits into the packed index
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(rvals), rtol=4e-5, atol=1e-2
    )
    agree = (np.asarray(idx) == np.asarray(ridx)).mean()
    assert agree > 0.99


def test_kernel_invalid_rows_survive_as_inf(rng):
    b, n, d = 8, ps.GROUP, 128
    _, c_lp, q, c = _mk(rng, b, n, d)
    q_lp = jnp.asarray(-2.0 * q, jnp.bfloat16)
    qsq = jnp.asarray((q ** 2).sum(1, keepdims=True))
    invalid = np.zeros(n, bool)
    # buckets are strided: lane 0 of group 0 = rows {m*BUCKET + 0}
    invalid[np.arange(0, ps.GROUP, ps.BUCKET)] = True
    bias = ps.make_bias(
        n, "l2", jnp.asarray((c ** 2).sum(1)), jnp.asarray(invalid), None
    )
    vals, _ = ps.bucket_min_scan(
        q_lp, qsq, c_lp, bias, positive=True, block_b=8, interpret=True
    )
    assert np.isinf(np.asarray(vals)[:, 0]).all()
    assert np.isfinite(np.asarray(vals)[:, 1:]).all()


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_fused_pipeline_recall(rng, metric):
    b, n, d, k = 24, 2 * ps.GROUP, 64, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids = topk_ops.flat_topk_fused(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(c, jnp.bfloat16),
        k=k, metric=metric, interpret=True,
    )
    if metric == "l2":
        gt = np.argsort(
            ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1
        )[:, :k]
    else:
        gt = np.argsort(1.0 - q @ c.T, axis=1)[:, :k]
    rec = np.mean([
        len(set(ids[i].tolist()) & set(gt[i].tolist())) / k for i in range(b)
    ])
    assert rec >= 0.95, rec
    assert np.all(np.diff(np.asarray(dists), axis=1) >= -1e-6)


def test_fused_pipeline_filter_and_padding(rng):
    # capacity NOT a multiple of GROUP → row padding; odd B → query padding
    b, n, d, k = 5, ps.GROUP + 300, 32, 5
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    allowed = np.zeros(n, bool)
    allowed[::7] = True
    dists, ids = topk_ops.flat_topk_fused(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(c, jnp.bfloat16),
        k=k, metric="l2", filter_mask=jnp.asarray(allowed), interpret=True,
    )
    ids = np.asarray(ids)
    assert (ids % 7 == 0).all() and (ids < n).all()
    masked = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    masked[:, ~allowed] = np.inf
    gt = np.argsort(masked, axis=1)[:, :k]
    rec = np.mean([
        len(set(ids[i].tolist()) & set(gt[i].tolist())) / k for i in range(b)
    ])
    assert rec >= 0.9, rec


def test_fused_multiblock_merge(rng):
    # two scan blocks: block_rows = GROUP
    b, n, d, k = 8, 4 * ps.GROUP, 32, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids = topk_ops.flat_topk_fused(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(c, jnp.bfloat16),
        k=k, metric="l2", block_rows=2 * ps.GROUP, interpret=True,
    )
    gt = np.argsort(((q[:, None, :] - c[None, :, :]) ** 2).sum(-1), 1)[:, :k]
    rec = np.mean([
        len(set(np.asarray(ids)[i].tolist()) & set(gt[i].tolist())) / k
        for i in range(b)
    ])
    assert rec >= 0.95, rec


def test_fused_block_rows_not_a_divisor(rng):
    """Regression (r4 diag): a block_rows that does not divide the padded
    capacity must shrink to the largest quantum-aligned divisor instead
    of raising 'capacity not divisible' (callers pass arbitrary config
    values; 10,027,008 % 262,144 != 0 killed the first 10M diagnosis)."""
    b, n, d, k = 8, 3 * ps.GROUP, 32, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids = topk_ops.flat_topk_fused(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(c, jnp.bfloat16),
        k=k, metric="l2", block_rows=2 * ps.GROUP, interpret=True,
    )
    gt = np.argsort(((q[:, None, :] - c[None, :, :]) ** 2).sum(-1), 1)[:, :k]
    rec = np.mean([
        len(set(np.asarray(ids)[i].tolist()) & set(gt[i].tolist())) / k
        for i in range(b)
    ])
    assert rec >= 0.95, rec


# ---------------------------------------------------------------------------
# int8 variant
# ---------------------------------------------------------------------------

def _quant(x, scale):
    return np.clip(np.round(x / scale), -127, 127).astype(np.int8)


def test_i8_kernel_matches_reference(rng):
    b, n, d = 16, ps.GROUP, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.abs(q).max() / 127
    sc = np.abs(c).max() / 127
    qi = jnp.asarray(_quant(q, sq))
    ci = jnp.asarray(_quant(c, sc))
    inv_two = jnp.float32(1.0 / (2 * sq * sc))
    bias = ps.make_bias_i8(
        n, d, "l2", jnp.asarray((c ** 2).sum(1)), inv_two, None, None
    )
    vals, idx = ps.bucket_min_scan_i8(
        qi, ci, bias, block_b=8, interpret=True
    )
    rvals, ridx = ps.bucket_min_scan_i8_reference(qi, ci, bias)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rvals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))


def test_i8_invalid_rows_cross_threshold(rng):
    b, n, d = 8, ps.GROUP, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.abs(q).max() / 127
    sc = np.abs(c).max() / 127
    qi = jnp.asarray(_quant(q, sq))
    ci = jnp.asarray(_quant(c, sc))
    invalid = np.zeros(n, bool)
    invalid[np.arange(0, ps.GROUP, ps.BUCKET)] = True  # lane 0 buckets
    inv_two = jnp.float32(1.0 / (2 * sq * sc))
    bias = ps.make_bias_i8(
        n, d, "l2", jnp.asarray((c ** 2).sum(1)), inv_two,
        jnp.asarray(invalid), None,
    )
    vals, idx = ps.bucket_min_scan_i8(
        qi, ci, bias, block_b=8, interpret=True
    )
    _, _, _, thresh = ps.i8_layout(d)
    v = np.asarray(vals).reshape(b, -1, ps.BUCKET)
    # lane 0 of every group only ever saw invalid rows
    assert (v[:, :, 0] > thresh).all()
    assert (v[:, :, 1:] <= thresh).all()


@pytest.mark.parametrize("span", [1, 2, 4])
def test_i8_packed_kernel_matches_reference(rng, span):
    # span=1 exercises the fused 2-op epilogue (pre_shift==0 at d=128);
    # span=2/4 exercise the shifted chunk_ref path — same oracle
    b, n, d = 16, 4 * ps.GROUP, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.abs(q).max() / 127
    sc = np.abs(c).max() / 127
    qi = jnp.asarray(_quant(q, sq))
    ci = jnp.asarray(_quant(c, sc))
    inv_two = jnp.float32(1.0 / (2 * sq * sc))
    bias = ps.make_bias_i8_packed(
        n, d, span, "l2", jnp.asarray((c ** 2).sum(1)), inv_two, None, None
    )
    packed = ps.bucket_min_scan_i8_packed(
        qi, ci, bias, span=span, block_b=8, interpret=True
    )
    ref = ps.bucket_min_scan_i8_packed_reference(qi, ci, bias, span=span)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(ref))


def test_i8_fused_pipeline_recall(rng):
    from valkey_search_tpu.ops import topk as tk

    b, n, d, k = 16, 2 * ps.GROUP, 24, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    sc = np.float32(np.abs(c).max() / 127)
    ci8 = jnp.asarray(_quant(c, sc))
    dists, ids = tk.flat_topk_fused(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(c, jnp.bfloat16), k=k,
        metric="l2", corpus_i8=ci8, i8_scale=jnp.float32(sc),
        interpret=True,
    )
    gt = np.argsort(((c[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :k]
    recall = np.mean([
        len(set(np.asarray(ids)[i].tolist()) & set(gt[i].tolist())) / k
        for i in range(b)
    ])
    assert recall >= 0.95, recall
    # returned distances are exact fp32
    ref_d = ((c[np.asarray(ids)[0]] - q[0]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dists)[0], ref_d, rtol=1e-4)


def test_i8_fused_filter(rng):
    from valkey_search_tpu.ops import topk as tk

    b, n, d, k = 8, 2 * ps.GROUP, 16, 5
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    sc = np.float32(np.abs(c).max() / 127)
    keep = rng.random(n) < 0.3
    dists, ids = tk.flat_topk_fused(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(c, jnp.bfloat16), k=k,
        metric="l2", corpus_i8=jnp.asarray(_quant(c, sc)),
        i8_scale=jnp.float32(sc), filter_mask=jnp.asarray(keep),
        interpret=True,
    )
    ids = np.asarray(ids)
    assert (keep[ids[ids >= 0]]).all()


def test_auto_block_b_vmem_guard():
    """High-d corpora must shrink the query tile: block_b=1024 at d=768
    measured 712K over the 16 MB scoped-VMEM limit on a v5e
    (scripts/recall_shapes.py r5)."""
    from valkey_search_tpu.ops import topk as tk

    assert tk._auto_block_b(65536, 128) == 1024   # headline shape
    assert tk._auto_block_b(65536, 256) == 1024
    assert tk._auto_block_b(16384, 768) == 512    # embedding shape
    assert tk._auto_block_b(16384, 2048) == 256
    assert tk._auto_block_b(512, 768) == 512      # small batches unchanged
    assert tk._auto_block_b(100, 128) == 104      # rounds up to 8
