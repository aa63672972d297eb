"""Streaming exact k-NN: blocked corpus scan with a running top-k.

TPU-native replacement for the reference's brute-force index
(third_party/hnswlib/bruteforce.h:213 — a per-query linear SIMD scan).
Here a batch of queries is scored against corpus blocks with one MXU matmul
per block, and per-block top-k results are merged into a running top-k via
``lax.top_k`` — so HBM traffic is one streaming pass over the corpus per
*batch* (amortized across B queries) and the [B, N] score matrix is never
materialized.

Distances are "smaller is better" throughout (hnswlib convention); invalid
rows (unallocated capacity, deleted, filtered-out) score +inf.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from valkey_search_tpu.ops import distance as dist_ops

# Plain Python scalars, NOT jnp arrays: a module-level jnp constant is
# committed to the import-time default device and poisons lowering for any
# other backend (embedding a TPU-resident constant into a CPU program forces
# a cross-client transfer during MLIR lowering).
INF = float("inf")
INVALID_ID = -1


def merge_topk(
    dists_a: jnp.ndarray,
    ids_a: jnp.ndarray,
    dists_b: jnp.ndarray,
    ids_b: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two top-k sets [B, ka] + [B, kb] → best k, ascending by distance.

    Also the cross-shard merge primitive: the reference merges per-shard
    results in a k-bounded max-heap on the coordinator
    (src/query/fanout.cc:69-222 SearchPartitionResultsTracker); here shards'
    top-k rows are concatenated (post all-gather) and re-selected.
    """
    d = jnp.concatenate([dists_a, dists_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    neg_top, pos = jax.lax.top_k(-d, k)
    return -neg_top, jnp.take_along_axis(i, pos, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "precision"),
)
def _rescore_exact(
    queries: jnp.ndarray,      # [B, d] fp32
    corpus: jnp.ndarray,       # [cap, d] fp32
    cand_ids: jnp.ndarray,     # [B, C] int32 (-1 padded)
    cand_valid_d: jnp.ndarray, # [B, C] coarse distances (inf = invalid)
    k: int,
    metric: str = "l2",
    block_rows: int = 0,       # unused; keeps signature uniform
    precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact re-ranking of coarse candidates: gather fp32 rows, one
    einsum, top-k (the second stage of the bf16-coarse / fp32-rescore
    retrieval)."""
    cand = jnp.take(corpus, jnp.maximum(cand_ids, 0), axis=0)  # [B, C, d]
    d = dist_ops.batched_candidate_scores(
        queries.astype(jnp.float32), cand, metric, precision
    )
    d = jnp.where((cand_ids >= 0) & jnp.isfinite(cand_valid_d), d, INF)
    kk = min(k, d.shape[-1])
    neg_top, pos = jax.lax.top_k(-d, kk)
    out_d = -neg_top
    out_i = jnp.take_along_axis(cand_ids, pos, axis=-1)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, INVALID_ID)
    if kk < k:  # tiny corpus: pad out to k
        pad = k - kk
        out_d = jnp.pad(out_d, ((0, 0), (0, pad)), constant_values=INF)
        out_i = jnp.pad(out_i, ((0, 0), (0, pad)), constant_values=INVALID_ID)
    return out_d, out_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "coarse_factor"),
)
def flat_topk_two_stage(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,      # fp32 [cap, d]
    corpus_lp: jnp.ndarray,   # bf16 [cap, d] (same rows)
    k: int,
    metric: str = "l2",
    corpus_sq: Optional[jnp.ndarray] = None,
    invalid: Optional[jnp.ndarray] = None,
    filter_mask: Optional[jnp.ndarray] = None,
    block_rows: int = 131072,
    coarse_factor: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage exact-ish k-NN: bf16 coarse scan (half the HBM traffic,
    pure-bf16 MXU passes) over-retrieving coarse_factor*k candidates at a
    light recall target, then an exact fp32 rescore. Swept on 1M x 128
    clustered data (256k blocks): cf=3 @ rt 0.95 = 169.7k qps, recall@10
    0.9984 — the frontier point (cf=4: 155.6k @ 0.9979; cf=2 drops the
    recall margin; cf=1 caps at ~0.90 because bf16 ordering noise pushes
    true neighbors past rank k regardless of the approx recall target).
    Jitted as one program so both stages fuse into a single launch."""
    ck = min(coarse_factor * k, corpus.shape[0])
    cd, ci = flat_topk(
        queries.astype(jnp.bfloat16),
        corpus_lp,
        k=ck,
        metric=metric,
        corpus_sq=corpus_sq,
        invalid=invalid,
        filter_mask=filter_mask,
        block_rows=block_rows,
        precision="high",
        mode="approx",
        approx_recall_target=0.95,
        approx_over_retrieve=1,  # ck already over-retrieves
    )
    return _rescore_exact(
        queries, corpus, ci, cd, k=k, metric=metric, precision="highest"
    )


def use_fused_scan(cap: int, filter_mask) -> bool:
    """Route a coarse scan to the fused Pallas kernel?

    True when the configured scan kernel allows it, the backend is a real
    TPU (the kernel is Mosaic-compiled; the CPU test mesh runs it only in
    interpret mode), the corpus is large enough that bucketed selection has
    headroom (>= 131072 rows → >= 1024 buckets per block), and any
    pre-filter is query-shared (per-query [B, cap] masks need the XLA path).
    """
    from valkey_search_tpu.runtime import config

    choice = str(config.get("search.scan-kernel"))
    if choice == "xla":
        return False
    if filter_mask is not None and filter_mask.ndim != 1:
        return False
    if cap < 131072:
        return False
    if choice == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _auto_block_b(b: int, d: int) -> int:
    """Query-tile rows for the fused kernels. 1024 is the MXU sweet spot
    at d=128, but the kernel's scoped-VMEM stack (query tile [block_b, d]
    + [block_b, block_n] score tile) is budgeted against the 16 MB limit
    at that shape — d=768 at block_b=1024 measured 712K over
    (scripts/recall_shapes.py r5). Halve the tile as d grows; recall is
    unaffected and the MXU still sees >=256-row LHS tiles."""
    block_b = 1024 if b >= 1024 else -(-b // 8) * 8
    if d > 1024:
        return min(block_b, 256)
    if d > 256:
        return min(block_b, 512)
    return block_b


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "block_rows", "coarse_factor", "interpret", "span",
        "block_b", "sel_recall_target",
    ),
)
def flat_topk_fused(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,      # fp32 [cap, d]
    corpus_lp: Optional[jnp.ndarray],  # bf16 [cap, d]; None when int8 serves
    k: int,
    metric: str = "l2",
    corpus_sq: Optional[jnp.ndarray] = None,
    invalid: Optional[jnp.ndarray] = None,
    filter_mask: Optional[jnp.ndarray] = None,  # 1-D only (shared prefilter)
    block_rows: int = 262144,
    coarse_factor: Optional[int] = None,
    corpus_i8: Optional[jnp.ndarray] = None,  # int8 [cap, d] mirror
    i8_scale: Optional[jnp.ndarray] = None,   # scalar f32 corpus quant scale
    span: Optional[int] = None,  # int8 survivor granularity (None = auto)
    block_b: Optional[int] = None,      # kernel query-tile rows (None = auto)
    sel_recall_target: Optional[float] = None,  # survivor approx_min_k target
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage k-NN with the coarse scan fused into a Pallas kernel.

    Same contract and recall story as ``flat_topk_two_stage`` but the coarse
    stage never writes the [B, N] score matrix to HBM (see
    ops/pallas_scan.py): the kernel emits one (min, argmin) survivor per 128
    corpus rows, an exact ``lax.top_k`` picks coarse_factor*k of the
    survivors, and the fp32 rescore restores exact ordering. Requires a 1-D
    (query-shared) filter mask; per-query masks fall back to the XLA path in
    the callers.
    """
    from valkey_search_tpu.ops import pallas_scan as ps

    cap, d = corpus.shape
    b = queries.shape[0]
    if filter_mask is not None and filter_mask.ndim != 1:
        raise ValueError("flat_topk_fused needs a 1-D filter mask")
    from valkey_search_tpu.ops import pallas_scan as _ps
    if metric == "l2" and corpus_sq is None:
        corpus_sq = dist_ops.squared_norms(
            corpus_lp if corpus_lp is not None else corpus
        )
    # alpha is folded into the queries (one fewer VPU op per score element
    # in the kernel epilogue — see pallas_scan._kernel); for l2 the
    # ||q||^2 row constant makes coarse scores the true non-negative
    # squared distance, unlocking the raw-bits key path.
    alpha = -2.0 if metric == "l2" else -1.0
    positive = metric == "l2"
    use_i8 = corpus_i8 is not None
    if coarse_factor is None:
        # swept on clustered byte data (B=65536, k=10, device-completion
        # timing — scripts/mfu_sweep.py r4): 1M int8 span8 — cf5 462.7k
        # qps @0.9930, cf4 513.7k @0.9922, cf3 534.3k @0.9875 (below the
        # 0.99 floor), cf6 441.5k @0.9930 (recall survivor-limited: extra
        # rescore buys nothing) → cf4 is the frontier point at >=0.99.
        # 10M int8 — cf5 = 0.9938, cf8 = 0.9996 at ~17% QPS cost (the
        # survivor pool spans more blocks, so per-block over-retrieval
        # must rise to keep the merged top-k covered). bf16 path: cf3 =
        # 125k qps @0.9973 at 1M (measured r4).
        if use_i8:
            if cap >= 4_000_000:
                coarse_factor = 8
            elif cap >= 1_048_576:
                coarse_factor = 4
            else:
                coarse_factor = 5
        else:
            coarse_factor = 3
    kc = min(coarse_factor * k, cap)
    pad_d = -d % 128
    d_pad = d + pad_d

    if block_b is None:
        block_b = _auto_block_b(b, d)
    pad_b = -b % block_b
    # packed int8 survivors cover span*128 rows each; pick span so the
    # survivor array stays >= ~2k columns for the top-k's bucketing
    if use_i8:
        if span is None:
            # span=1 keeps pre_shift at 0 for d <= ~512 (fused 2-op kernel
            # epilogue, pallas_scan._kernel_i8_packed_fused) and one
            # survivor per 128 rows — but it 4x-es the survivor array, and
            # the SELECTION over it dominates long before HBM does:
            # profiled at 1M x 128, B=65536 (scripts/profile_scan.py, r4)
            # the coarse kernel is ~equal (583k vs 575k qps) while the
            # survivor top-k is 184ms at span=1 (7936 cols) vs 99ms at
            # span=4 (2048 cols); end-to-end span=1/cf=5 = 177k qps
            # @0.9984 vs span=4/cf=5 = 271k @0.9938. The device-completion
            # sweep (scripts/mfu_sweep.py r4) pushed further: span=8 at 1M
            # is 462.7k @0.9930 (cf5) / 513.7k @0.9922 (cf4) vs span=4's
            # 401.7k @0.9965 — but span=16 (512 survivor cols at 1M)
            # drops to 0.9844, below the 0.99 floor. So: span 8 while the
            # survivor width stays >= ~1k columns, 4 down to ~1k at
            # span 4, 1 below that.
            if cap >= 1_048_576:
                span = 8
            elif cap >= 524_288:
                span = 4
            else:
                span = 1
        quantum = ps.GROUP * span
    else:
        span = 1
        quantum = ps.GROUP
    pad_n = -cap % quantum
    n = cap + pad_n
    block_rows = -(-block_rows // quantum) * quantum

    if use_i8:
        # packed int8 coarse stage: 2x MXU rate, 3-op integer epilogue,
        # single int32 survivor per span*128 rows (pallas_scan
        # _kernel_i8_packed). Queries get a per-batch global scale; the
        # corpus mirror carries its own (store-published) scale.
        if i8_scale is None:
            raise ValueError("corpus_i8 needs i8_scale")
        sq = jnp.maximum(
            jnp.max(jnp.abs(queries.astype(jnp.float32))) / 127.0, 1e-30
        )
        q_i8 = jnp.clip(
            jnp.round(queries.astype(jnp.float32) / sq), -127, 127
        ).astype(jnp.int8)
        if pad_b:
            q_i8 = jnp.pad(q_i8, ((0, pad_b), (0, 0)))
        if pad_d:
            q_i8 = jnp.pad(q_i8, ((0, 0), (0, pad_d)))
        inv_two = 1.0 / (2.0 * sq * i8_scale.astype(jnp.float32))
        bias_i = ps.make_bias_i8_packed(
            cap, d_pad, span, metric, corpus_sq, inv_two, invalid,
            filter_mask,
        )
        _, _, sentinel_i, pre_shift_i, invalid_thresh = ps.i8_packed_layout(
            d_pad, span
        )
        chunk_bits = (span * (ps.GROUP // ps.BUCKET) - 1).bit_length()
        c_i8 = corpus_i8
        if pad_n:
            c_i8 = jnp.pad(c_i8, ((0, pad_n), (0, 0)))
            bias_i = jnp.pad(
                bias_i, ((0, 0), (0, pad_n)), constant_values=sentinel_i
            )
        if pad_d:
            c_i8 = jnp.pad(c_i8, ((0, 0), (0, pad_d)))
        c_scan, bias_scan = c_i8, bias_i
    else:
        if corpus_lp is None:
            raise ValueError("flat_topk_fused needs corpus_lp or corpus_i8")
        q_lp = (queries.astype(jnp.float32) * alpha).astype(jnp.bfloat16)
        qsq = (
            dist_ops.squared_norms(queries)[:, None]
            if positive
            else jnp.zeros((b, 1), jnp.float32)
        )
        if pad_b:
            q_lp = jnp.pad(q_lp, ((0, pad_b), (0, 0)))
            qsq = jnp.pad(qsq, ((0, pad_b), (0, 0)))
        if pad_d:
            q_lp = jnp.pad(q_lp, ((0, 0), (0, pad_d)))

        bias = ps.make_bias(cap, metric, corpus_sq, invalid, filter_mask)
        c_lp = corpus_lp
        if pad_n:
            c_lp = jnp.pad(c_lp, ((0, pad_n), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, pad_n)), constant_values=INF)
        if pad_d:
            c_lp = jnp.pad(c_lp, ((0, 0), (0, pad_d)))
        c_scan, bias_scan = c_lp, bias

    # A single kernel block is fastest (no merge pass, full grid), but the
    # coarse survivor pair is [B, block/128] x 8 bytes — at 10M rows x
    # 65536 queries that is 41 GB. Budget = what HBM can hold alongside
    # the resident corpus mirrors (with headroom for the top-k workspace
    # and allocator fragmentation); shrink the block to the largest
    # GROUP-aligned divisor of n that fits.
    resident = corpus.nbytes
    if corpus_lp is not None:
        resident += corpus_lp.nbytes
    if use_i8:
        resident += corpus_i8.nbytes
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm_limit = int(stats.get("bytes_limit", 16 << 30))
    except Exception:
        hbm_limit = 16 << 30
    surv_budget = max(1 << 30, int(hbm_limit * 0.70) - resident)
    bs = min(block_rows, n)
    b_padded = b + pad_b

    def _surv_bytes(width):
        if use_i8:
            # packed keys + their f32 bitcast view for the top-k
            return b_padded * (width // (ps.BUCKET * span)) * 8
        return b_padded * (width // ps.BUCKET) * 8

    if _surv_bytes(bs) > surv_budget or n % bs:
        # largest quantum-aligned divisor of n that fits both the
        # caller's block_rows and the survivor budget (callers pass
        # arbitrary block_rows; n is quantum-padded, so m=n//quantum
        # always terminates the search)
        m = 2
        while not (
            n % m == 0
            and (n // m) % quantum == 0
            and n // m <= max(bs, quantum)
            and _surv_bytes(n // m) <= surv_budget
        ):
            m += 1
            if m > n // quantum:
                raise ValueError(
                    f"no survivor-budget block split for n={n}, B={b}"
                )
        bs = n // m
    block_rows = bs

    def _survivor_min_k(vals, kk, recall_target=0.98):
        """Min-k over survivor rows. approx_min_k at wide rows is
        pathological through the axon backend (r4 diag: one call at
        [16384, 19584] wedged the device for >8 min — the r4 bench's
        10M-scan stall), so wide rows are chunked to the proven
        2048-column shape: batched approx per chunk, then an exact
        top_k merge over the chunks*kk candidates. inf-padding decodes
        to INVALID_ID downstream in both key spaces."""
        w = vals.shape[-1]
        if interpret or w < 2048:
            neg, pos = jax.lax.top_k(-vals, kk)
            return -neg, pos
        if w <= 4096:
            return jax.lax.approx_min_k(
                vals, kk, recall_target=recall_target
            )
        cw = 2048
        pad_w = -w % cw
        rows = vals.shape[0]
        if pad_w:
            vals = jnp.pad(
                vals, ((0, 0), (0, pad_w)), constant_values=jnp.inf
            )
        c = vals.shape[-1] // cw
        kchunk = min(kk, cw)
        v3 = vals.reshape(rows, c, cw)
        bf3, p3 = jax.lax.approx_min_k(
            v3, kchunk, recall_target=recall_target
        )
        cand_v = bf3.reshape(rows, c * kchunk)
        cand_p = (
            p3 + (jnp.arange(c, dtype=p3.dtype) * cw)[None, :, None]
        ).reshape(rows, c * kchunk)
        neg, sel = jax.lax.top_k(-cand_v, kk)
        return -neg, jnp.take_along_axis(cand_p, sel, axis=-1)

    def coarse_block(c_blk, bias_blk, row0):
        if use_i8:
            # packed keys: the top-k runs on the f32 bitcast view (keys
            # are non-negative ints → bitcast order == integer order) and
            # the selected VALUES are the keys — no idx array, no
            # take_along gather over the survivor matrix
            packed = ps.bucket_min_scan_i8_packed(
                q_i8, c_blk, bias_blk, span=span,
                # block_n swept on-chip at 1M/span=4 (profile_scan r4):
                # 512/1024/2048/4096 -> 126/112/104/101 ms; 4096 keeps the
                # [block_b, block_n] f32 tile at 16MB of VMEM
                block_b=block_b, block_n=4096, interpret=interpret,
            )
            pf = jax.lax.bitcast_convert_type(packed, jnp.float32)
            kk = min(kc, pf.shape[-1])
            # survivors are span*128x smaller than the score matrix, so
            # a tight selection recall target is nearly free here
            bf, pos = _survivor_min_k(
                pf, kk, recall_target=sel_recall_target or 0.98
            )
            key = jax.lax.bitcast_convert_type(bf, jnp.int32)
            chunk = key & ((span * 128) - 1)
            score = (key >> chunk_bits) << pre_shift_i
            bi = (
                row0
                + (pos // 128) * (span * ps.GROUP)
                + chunk * ps.BUCKET
                + (pos % 128)
            )
            bad = score > invalid_thresh
            bd = jnp.where(bad, INF, score.astype(jnp.float32))
            bi = jnp.where(bad, INVALID_ID, bi)
            return bd, bi
        vals, idx = ps.bucket_min_scan(
            q_lp, qsq, c_blk, bias_blk, positive=positive,
            block_b=block_b, block_n=1024, interpret=interpret,
        )
        kk = min(kc, vals.shape[-1])
        bd, pos = _survivor_min_k(vals, kk, recall_target=0.95)
        bi = jnp.take_along_axis(idx, pos, axis=-1) + row0
        bi = jnp.where(jnp.isinf(bd), INVALID_ID, bi)
        return bd, bi

    if n <= block_rows:
        cd, ci = coarse_block(c_scan, bias_scan, 0)
    else:
        if n % block_rows:
            raise ValueError(
                f"capacity {n} not divisible by block_rows {block_rows}"
            )
        nblk = n // block_rows
        c_b = c_scan.reshape(nblk, block_rows, c_scan.shape[1])
        bias_b = bias_scan.reshape(nblk, 1, block_rows)

        def step(carry, xs):
            run_d, run_i, row0 = carry
            bd, bi = coarse_block(xs[0], xs[1], row0)
            md, mi = merge_topk(run_d, run_i, bd, bi, bd.shape[-1])
            return (md, mi, row0 + block_rows), None

        kk = min(kc, block_rows // (ps.BUCKET * span))
        init = (
            jnp.full((b_padded, kk), INF, jnp.float32),
            jnp.full((b_padded, kk), INVALID_ID, jnp.int32),
            jnp.int32(0),
        )
        (cd, ci, _), _ = jax.lax.scan(step, init, (c_b, bias_b))

    if pad_b:
        cd, ci = cd[:b], ci[:b]
    ci = jnp.where(ci >= cap, INVALID_ID, ci)  # padded corpus rows
    return _rescore_exact(
        queries, corpus, ci, cd, k=k, metric=metric, precision="highest"
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "block_rows", "precision", "mode",
        "approx_recall_target", "approx_over_retrieve",
    ),
)
def flat_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "l2",
    corpus_sq: Optional[jnp.ndarray] = None,
    invalid: Optional[jnp.ndarray] = None,
    filter_mask: Optional[jnp.ndarray] = None,
    block_rows: int = 131072,
    precision: str = "highest",
    mode: str = "exact",
    approx_recall_target: float = 0.99,
    approx_over_retrieve: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN of ``queries`` [B, d] over ``corpus`` [cap, d].

    Args:
      invalid: optional bool [cap]; True rows are never returned (unallocated
        slots and tombstoned deletes — reference hnswalg.h markDelete :1156).
      filter_mask: optional bool [cap] (or [B, cap]) of rows *allowed* by a
        hybrid pre-filter predicate (reference src/query/search.cc:456
        CalcBestMatchingPrefilteredKeys scores only qualified keys; here the
        mask is fused into the scan epilogue instead).
      block_rows: corpus rows scored per scan step; cap must be divisible by
        it unless cap <= block_rows (the flat index pads capacity).
      mode: per-block selection primitive. "exact" = lax.top_k;
        "approx" = lax.approx_min_k (the TPU-optimized partial-reduce
        top-k — 2-3x faster; per-block recall_target 0.95 measured at
        end-to-end recall@10 ≥ 0.99 because cross-block merges stay
        exact and per-block misses are uncorrelated).

    Returns (dists [B, k], ids [B, k]) ascending; empty slots are (+inf, -1).
    """
    cap = corpus.shape[0]
    b = queries.shape[0]
    # keep bf16 queries when the corpus is bf16 (pure-bf16 MXU passes for
    # the two-stage coarse scan); fp32 otherwise
    qdt = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32
    queries = queries.astype(qdt)

    if metric == "l2" and corpus_sq is None:
        corpus_sq = dist_ops.squared_norms(corpus)

    def score_block(c_vecs, c_sq, c_invalid, c_filter, row0):
        s = dist_ops.pairwise_scores(
            queries, c_vecs, metric=metric, corpus_sq=c_sq, precision=precision
        )
        if c_invalid is not None:
            s = jnp.where(c_invalid[None, :], INF, s)
        if c_filter is not None:
            fm = c_filter if c_filter.ndim == 2 else c_filter[None, :]
            s = jnp.where(fm, s, INF)
        if mode == "approx" and c_vecs.shape[0] > 1024:
            # over-retrieve then trim in the exact merge: approx errors at
            # rank <= over*k almost never reach the top-k
            kk = min(approx_over_retrieve * k, c_vecs.shape[0])
            d, pos = jax.lax.approx_min_k(
                s, kk, recall_target=approx_recall_target
            )
        else:
            kk = min(k, c_vecs.shape[0])
            neg_top, pos = jax.lax.top_k(-s, kk)
            d = -neg_top
        ids = (pos + row0).astype(jnp.int32)
        ids = jnp.where(jnp.isinf(d), INVALID_ID, ids)
        if d.shape[-1] < k:  # tiny corpus: pad out to k
            pad = k - d.shape[-1]
            d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=INF)
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return d, ids

    if cap <= block_rows:
        d, ids = score_block(corpus, corpus_sq, invalid, filter_mask, 0)
        if d.shape[-1] > k:  # approx over-retrieval: exact trim to k
            neg_top, pos = jax.lax.top_k(-d, k)
            d = -neg_top
            ids = jnp.take_along_axis(ids, pos, axis=-1)
        return d, ids

    if cap % block_rows != 0:
        raise ValueError(f"capacity {cap} not divisible by block_rows {block_rows}")
    n_blocks = cap // block_rows

    corpus_b = corpus.reshape(n_blocks, block_rows, corpus.shape[1])
    sq_b = corpus_sq.reshape(n_blocks, block_rows) if corpus_sq is not None else None
    inv_b = invalid.reshape(n_blocks, block_rows) if invalid is not None else None
    if filter_mask is not None:
        if filter_mask.ndim == 2:
            filt_b = filter_mask.reshape(b, n_blocks, block_rows).swapaxes(0, 1)
        else:
            filt_b = filter_mask.reshape(n_blocks, block_rows)
    else:
        filt_b = None

    def step(carry, xs):
        run_d, run_i, row0 = carry
        c_vecs = xs[0]
        c_sq = xs[1] if sq_b is not None else None
        off = 2 if sq_b is not None else 1
        c_inv = xs[off] if inv_b is not None else None
        off += 1 if inv_b is not None else 0
        c_filt = xs[off] if filt_b is not None else None
        bd, bi = score_block(c_vecs, c_sq, c_inv, c_filt, row0)
        md, mi = merge_topk(run_d, run_i, bd, bi, k)
        return (md, mi, row0 + block_rows), None

    xs = [corpus_b]
    if sq_b is not None:
        xs.append(sq_b)
    if inv_b is not None:
        xs.append(inv_b)
    if filt_b is not None:
        xs.append(filt_b)

    init = (
        jnp.full((b, k), INF, jnp.float32),
        jnp.full((b, k), INVALID_ID, jnp.int32),
        jnp.int32(0),
    )
    (d, i, _), _ = jax.lax.scan(step, init, tuple(xs))
    return d, i
