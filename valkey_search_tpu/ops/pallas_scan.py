"""Fused coarse-scan Pallas kernel: distance matmul + per-bucket min/argmin.

The XLA two-stage coarse scan (ops/topk.py flat_topk_two_stage) is HBM-bound:
the [B, N] bf16 score matrix produced by the distance matmul round-trips HBM
before ``lax.approx_min_k`` reduces it (at B=16384, N=262144 that is ~17 GB
of traffic per block against ~70 MB of inputs). This kernel fuses the
reduction into the matmul epilogue: each grid step computes a
[block_b, BLOCK_N] score tile in VMEM and immediately collapses every
128-row bucket to its (min value, argmin row), so HBM sees only the corpus
stream plus a 128x-smaller survivor array.

This plays the same role as the reference's fused scoring loop — the
brute-force scan in third_party/hnswlib/bruteforce.h:213 never materializes
all scores either; it folds selection into the distance pass via a bounded
heap. Selection here is bucketed (one survivor per 128 consecutive corpus
rows) because a data-dependent heap does not map to the MXU/VPU; the
candidate loss from bucket collisions is recovered by coarse over-retrieval
plus the exact fp32 rescore, exactly like the approx_min_k path (approx
recall math is identical — lax.approx_min_k uses the same partial-reduce
bucketing internally, just without the matmul fusion).

Scores are "smaller is better": ``alpha * <q, c> + bias[c]`` with
- l2:        alpha=-2, bias=||c||²   (the per-query ||q||² offset cannot
                                      change per-query ordering, so it is
                                      dropped until the exact rescore)
- ip/cosine: alpha=-1, bias=0
Invalid rows (unallocated capacity, tombstones, filtered-out) carry
bias=+inf, which survives min-reduction and marks the survivor invalid.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
INVALID_ID = -1

BUCKET = 128            # corpus rows per survivor (one lane group)
BLOCK_N = 512           # corpus rows scored per grid step
NBT = BLOCK_N // BUCKET  # buckets emitted per grid step (4)
OUT_W = 128             # output block width in lanes
REVISIT = OUT_W // NBT  # consecutive N-steps that share one output block (32)
GROUP = BLOCK_N * REVISIT  # corpus rows per output block (16384)


def _kernel(q_ref, qsq_ref, c_ref, bias_ref, vals_ref, idx_ref, sv_ref,
            *, positive: bool, block_n: int = BLOCK_N,
            revisit: int = REVISIT):
    """One grid step: score [block_b, BLOCK_N] and fold into the group's
    running survivors.

    Buckets are *strided*: output lane l of a GROUP collects corpus rows
    {group_start + m*BUCKET + l, m in [GROUP/BUCKET)}, so every reduction
    is an elementwise 128-lane-aligned min/select — Mosaic forbids
    lane-dim stores at non-128-aligned offsets, which rules out packing
    contiguous buckets column-by-column. Membership is arbitrary anyway:
    ``idx`` carries absolute corpus rows and the downstream selection is
    an unordered top-k over all lanes. The output block is shared by
    REVISIT consecutive N-steps (index_map j // REVISIT); a
    [block_b, BUCKET] VMEM scratch pair accumulates across them and
    flushes on the group's last step.
    """
    j = pl.program_id(1)
    jm = j % revisit
    dots = jax.lax.dot_general(
        q_ref[...],
        c_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # The epilogue below runs on the VPU over every score element; at
    # D=128 each elementwise op costs ~0.4x the matmul's MXU time, so the
    # op count is the kernel's speed limit (alpha is pre-folded into the
    # queries by the wrapper for the same reason).
    #
    # Pack (score, chunk-id) into one monotonic int32 key so the whole
    # argmin reduction is pure integer min (1 VPU op per fold) instead of
    # a 3-op compare/select dance per chunk. For IEEE f32, raw bits as
    # signed i32 are already min-ordered when scores are >= 0; l2 gets
    # that for free by adding the per-query ||q||^2 row constant (making
    # the coarse score the true squared distance). Scores the bf16 matmul
    # rounds to just below zero sort before all positives with inverted
    # internal order — they are all true near-duplicates of the query, so
    # over-retrieval + exact rescore absorb it. Metrics without a
    # positivity guarantee (raw ip) instead apply the 3-op total-order
    # involution key = i ^ ((i >> 31) & 0x7fffffff). The low 7 key bits
    # are then replaced by the chunk index within the GROUP (GROUP/BUCKET
    # = 128 chunks); quantizing the coarse score by <= 127 ulp is noise
    # the cf*k over-retrieval + exact rescore already absorb.
    s = dots + bias_ref[...]  # [block_b, BLOCK_N] f32 in VMEM
    if positive:
        s = s + qsq_ref[...]
        key = jax.lax.bitcast_convert_type(s, jnp.int32)
    else:
        bits = jax.lax.bitcast_convert_type(s, jnp.int32)
        key = bits ^ ((bits >> 31) & jnp.int32(0x7FFFFFFF))
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    chunk = (col >> 7) + jm * (block_n // BUCKET)
    packed = (key & jnp.int32(~127)) | chunk
    w = block_n
    while w > BUCKET:
        w //= 2
        packed = jnp.minimum(packed[:, :w], packed[:, w:2 * w])

    @pl.when(jm == 0)
    def _init():
        sv_ref[...] = packed

    @pl.when(jm != 0)
    def _acc():
        sv_ref[...] = jnp.minimum(sv_ref[...], packed)

    @pl.when(jm == revisit - 1)
    def _flush():
        best = sv_ref[...]
        vbits = best & jnp.int32(~127)
        if not positive:
            vbits = vbits ^ ((vbits >> 31) & jnp.int32(0x7FFFFFFF))
        vals_ref[...] = jax.lax.bitcast_convert_type(vbits, jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, best.shape, 1)
        group_start = (j - (revisit - 1)) * block_n
        idx_ref[...] = group_start + (best & 127) * BUCKET + lane


@functools.partial(
    jax.jit, static_argnames=("positive", "block_b", "block_n", "interpret")
)
def bucket_min_scan(
    queries: jnp.ndarray,   # [B, D] bf16, alpha PRE-FOLDED (see wrapper)
    qsq: jnp.ndarray,       # [B, 1] f32 ||q||^2 (zeros unless positive)
    corpus: jnp.ndarray,    # [N, D] bf16 (N % GROUP == 0)
    bias: jnp.ndarray,      # [1, N] f32 (+inf rows are invalid)
    positive: bool,
    block_b: int = 512,
    block_n: int = BLOCK_N,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused coarse scan → (vals [B, N/128] f32, idx [B, N/128] i32).

    ``positive``: scores qsq + bias + <q, c> are guaranteed >= 0 up to
    bf16 rounding (true for l2 with alpha folded into q) — enables the
    cheap raw-bits key (see _kernel).
    """
    b, d = queries.shape
    n = corpus.shape[0]
    if n % GROUP or d % 128 or b % block_b or block_n % BUCKET \
            or GROUP % block_n:
        raise ValueError(
            f"bucket_min_scan alignment: B={b}%{block_b}, N={n}%{GROUP}, "
            f"D={d}%128, block_n={block_n} must align"
        )
    revisit = GROUP // block_n
    nb = n // BUCKET
    grid = (b // block_b, n // block_n)
    return pl.pallas_call(
        functools.partial(
            _kernel, positive=positive, block_n=block_n, revisit=revisit
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_b, OUT_W), lambda i, j, r=revisit: (i, j // r)
            ),
            pl.BlockSpec(
                (block_b, OUT_W), lambda i, j, r=revisit: (i, j // r)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nb), jnp.float32),
            jax.ShapeDtypeStruct((b, nb), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, BUCKET), jnp.int32),  # packed (score, chunk)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(queries, qsq, corpus, bias)


def bucket_min_scan_reference(
    queries: jnp.ndarray,
    qsq: jnp.ndarray,
    corpus: jnp.ndarray,
    bias: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA oracle for the kernel (tests compare against this).

    Mirrors the wrapper contract: alpha pre-folded into queries, qsq a
    per-row constant ([B, 1], zeros when unused). Values are full f32
    (the kernel quantizes its low 7 mantissa bits for index packing, so
    comparisons need ~2^-16 relative tolerance)."""
    dots = jax.lax.dot_general(
        queries, corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = dots + bias + qsq  # [B, N]
    b, n = s.shape
    # strided buckets (see _kernel): group g, lane l collects rows
    # {g*GROUP + m*BUCKET + l}; output column g*BUCKET + l
    sb = s.reshape(b, n // GROUP, GROUP // BUCKET, BUCKET)
    vals = sb.min(axis=2)                                  # [b, G, BUCKET]
    amin = jnp.argmin(sb, axis=2).astype(jnp.int32)        # chunk index m
    g = jnp.arange(n // GROUP, dtype=jnp.int32)[None, :, None]
    l = jnp.arange(BUCKET, dtype=jnp.int32)[None, None, :]
    idx = g * GROUP + amin * BUCKET + l
    return vals.reshape(b, n // BUCKET), idx.reshape(b, n // BUCKET)


def make_bias(
    n: int,
    metric: str,
    corpus_sq: Optional[jnp.ndarray],
    invalid: Optional[jnp.ndarray],
    filter_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """[1, n] coarse-score bias: norms for l2, 0 for ip/cosine; +inf for
    rows that must not be returned (invalid or excluded by a shared 1-D
    pre-filter)."""
    if metric == "l2":
        if corpus_sq is None:
            raise ValueError("l2 bias needs corpus_sq")
        bias = corpus_sq.astype(jnp.float32)
    else:
        bias = jnp.zeros((n,), jnp.float32)
    if invalid is not None:
        bias = jnp.where(invalid, INF, bias)
    if filter_mask is not None:
        bias = jnp.where(filter_mask, bias, INF)
    return bias[None, :]
