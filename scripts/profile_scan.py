"""Stage-level profile of the fused int8 flat scan at 1M x 128.

Answers VERDICT r3 weak#2/#5: where the 348ms/launch goes (coarse kernel
vs survivor top-k vs fp32 rescore), span=1 vs span=4, and the cf sweep —
so the flat regression (240k r1 -> 188k r3) is explained by measurement,
not supposition. Run on the real chip:

    python scripts/profile_scan.py [--quick]

Prints one JSON line per experiment.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from valkey_search_tpu.runtime import jaxinit

jaxinit.init()

import jax
import jax.numpy as jnp

from valkey_search_tpu.ops import pallas_scan as ps
from valkey_search_tpu.ops import topk as topk_ops

ap = argparse.ArgumentParser()
ap.add_argument("--quick", action="store_true")
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--b", type=int, default=65536)
args = ap.parse_args()

N, D, B, K = args.n, 128, args.b, 10
if args.quick:
    N, B = 262144, 8192

t0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-t0:6.1f}s] {m}", file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


log(f"backend={jax.default_backend()} N={N} B={B}")

rng = np.random.default_rng(42)
n_centers = 1024
centers = rng.standard_normal((n_centers, D)).astype(np.float32) * 60 + 128
assign = rng.integers(0, n_centers, size=N)
corpus = np.clip(
    centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 20,
    0, 255,
).astype(np.float32)
q_assign = rng.integers(0, n_centers, size=B)
queries = np.clip(
    centers[q_assign] + rng.standard_normal((B, D)).astype(np.float32) * 20,
    0, 255,
).astype(np.float32)

# ground truth on 64 queries
n_gt = 64
c64 = corpus.astype(np.float64)
c64_sq = np.einsum("ij,ij->i", c64, c64)
gt_sets = []
for q in queries[:n_gt].astype(np.float64):
    dd = c64_sq - 2.0 * (c64 @ q)
    part = np.argpartition(dd, K)[:K]
    gt_sets.append(set(part.tolist()))
del c64, c64_sq
log("ground truth done")

# device mirrors (mirrors what device_snapshot builds in int8 mode)
dcorp = jnp.asarray(corpus)
norms = jnp.einsum("ij,ij->i", dcorp, dcorp)
scale = jnp.maximum(jnp.max(jnp.abs(dcorp)) / 127.0, 1e-30).astype(jnp.float32)
c_i8 = jnp.clip(jnp.round(dcorp / scale), -127, 127).astype(jnp.int8)
invalid = jnp.zeros((N,), bool)
jax.block_until_ready((dcorp, norms, c_i8))
log("mirrors uploaded")

qd = jnp.asarray(queries)


def _sync(out):
    """One tiny D2H fetch per output leaf: through the axon tunnel this is
    the only reliable completion barrier (block_until_ready can return
    early: a 95ms kernel timed 0.06ms with it)."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, reps=3, warm=1):
    """RTT-cancelled per-rep time: wall(2*reps) - wall(reps) removes the
    fixed tunnel round-trip + sync cost that a single timed run bakes in
    (~60ms/fetch here, which drowned sub-100ms kernels)."""
    def run(k):
        tt = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        _sync(out)
        return time.perf_counter() - tt

    for _ in range(warm):
        run(1)
    t1 = min(run(reps) for _ in range(2))
    t2 = min(run(2 * reps) for _ in range(2))
    return max(t2 - t1, 1e-9) / reps


def recall_of(ids_np):
    return float(np.mean([
        len(set(ids_np[b, :K].tolist()) & gt_sets[b]) / K
        for b in range(n_gt)
    ]))


# ---- full path: span x cf sweep ------------------------------------------
SPANS = [int(s) for s in os.environ.get("PROF_SPANS", "1,2,4").split(",")]
CFS = [int(s) for s in os.environ.get("PROF_CFS", "3,5").split(",")]
FULLS = [] if os.environ.get("PROF_SKIP_FULL") else SPANS
for span in FULLS:
    for cf in CFS:
        try:
            def full(span=span, cf=cf):
                return topk_ops.flat_topk_fused(
                    qd, dcorp, None, k=K, metric="l2", corpus_sq=norms,
                    invalid=invalid, block_rows=1 << 30,
                    corpus_i8=c_i8, i8_scale=scale, span=span,
                    coarse_factor=cf,
                )
            sec = timeit(full)
            d_out, i_out = full()
            rec = recall_of(np.asarray(i_out))
            emit(exp="full", span=span, cf=cf, qps=round(B / sec, 0),
                 ms=round(sec * 1e3, 2), recall=round(rec, 4))
            log(f"full span={span} cf={cf}: {B/sec:,.0f} qps recall={rec:.4f}")
        except Exception as e:
            emit(exp="full", span=span, cf=cf, error=f"{type(e).__name__}: {e}")
            log(f"full span={span} cf={cf} FAILED {e}")

# ---- coarse kernel alone --------------------------------------------------
q_i8 = jnp.clip(jnp.round(qd / (jnp.max(jnp.abs(qd)) / 127.0)),
                -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("kk",))
def _amink(pf, kk):
    return jax.lax.approx_min_k(pf, kk, recall_target=0.98)


for span in SPANS:
    quantum = ps.GROUP * span
    pad_n = -N % quantum
    n_pad = N + pad_n
    cpad = jnp.pad(c_i8, ((0, pad_n), (0, 0))) if pad_n else c_i8
    _, _, sentinel, _, _ = ps.i8_packed_layout(D, span)
    inv_two = 1.0 / (2.0 * (jnp.max(jnp.abs(qd)) / 127.0) * scale)
    bias = ps.make_bias_i8_packed(N, D, span, "l2", norms, inv_two,
                                  invalid, None)
    bias = jnp.pad(bias, ((0, 0), (0, pad_n)), constant_values=sentinel) \
        if pad_n else bias
    jax.block_until_ready((cpad, bias))

    def coarse(span=span, cpad=cpad, bias=bias):
        return ps.bucket_min_scan_i8_packed(
            q_i8, cpad, bias, span=span, block_b=1024, block_n=1024)
    sec = timeit(coarse)
    nsv = n_pad // (128 * span)
    emit(exp="coarse", span=span, qps=round(B / sec, 0),
         ms=round(sec * 1e3, 2), surv_cols=nsv,
         surv_mb=round(B * nsv * 4 / 2**20, 1))
    log(f"coarse span={span}: {B/sec:,.0f} qps ({sec*1e3:.1f} ms)")

    # survivor top-k alone on the real packed output (argument, not a
    # captured constant — closure capture embeds GBs into the program)
    packed = coarse()
    pf = jax.block_until_ready(
        jax.lax.bitcast_convert_type(packed, jnp.float32))

    def seltop(pf=pf):
        return _amink(pf, 50)
    sec = timeit(seltop)
    emit(exp="survivor_topk", span=span, ms=round(sec * 1e3, 2))
    log(f"survivor approx_min_k span={span}: {sec*1e3:.1f} ms")
    del cpad, bias, packed, pf

# ---- rescore alone --------------------------------------------------------
for cands in (30, 50):
    ci = jnp.asarray(rng.integers(0, N, size=(B, cands)), jnp.int32)
    cd = jnp.zeros((B, cands), jnp.float32)

    def resc(ci=ci, cd=cd):
        return topk_ops._rescore_exact(qd, dcorp, ci, cd, k=K, metric="l2")
    sec = timeit(resc)
    emit(exp="rescore", cands=cands, ms=round(sec * 1e3, 2))
    log(f"rescore C={cands}: {sec*1e3:.1f} ms")

# ---- block_n sweep on the best span (kernel only) ------------------------
for block_n in (512, 1024, 2048, 4096):
    span = 4
    quantum = ps.GROUP * span
    pad_n = -N % quantum
    cpad = jnp.pad(c_i8, ((0, pad_n), (0, 0))) if pad_n else c_i8
    _, _, sentinel, _, _ = ps.i8_packed_layout(D, span)
    inv_two = 1.0 / (2.0 * (jnp.max(jnp.abs(qd)) / 127.0) * scale)
    bias = ps.make_bias_i8_packed(N, D, span, "l2", norms, inv_two,
                                  invalid, None)
    bias = jnp.pad(bias, ((0, 0), (0, pad_n)), constant_values=sentinel) \
        if pad_n else bias
    try:
        def coarse2(cpad=cpad, bias=bias, block_n=block_n):
            return ps.bucket_min_scan_i8_packed(
                q_i8, cpad, bias, span=4, block_b=1024, block_n=block_n)
        sec = timeit(coarse2)
        emit(exp="coarse_blockn", block_n=block_n, qps=round(B / sec, 0),
             ms=round(sec * 1e3, 2))
        log(f"coarse span=4 block_n={block_n}: {sec*1e3:.1f} ms")
    except Exception as e:
        emit(exp="coarse_blockn", block_n=block_n,
             error=f"{type(e).__name__}: {e}")
        log(f"coarse block_n={block_n} FAILED {e}")
    del cpad, bias

# ---- block_b sweep --------------------------------------------------------
for block_b in (256, 512, 1024, 2048):
    span = 4
    quantum = ps.GROUP * span
    pad_n = -N % quantum
    cpad = jnp.pad(c_i8, ((0, pad_n), (0, 0))) if pad_n else c_i8
    _, _, sentinel, _, _ = ps.i8_packed_layout(D, span)
    inv_two = 1.0 / (2.0 * (jnp.max(jnp.abs(qd)) / 127.0) * scale)
    bias = ps.make_bias_i8_packed(N, D, span, "l2", norms, inv_two,
                                  invalid, None)
    bias = jnp.pad(bias, ((0, 0), (0, pad_n)), constant_values=sentinel) \
        if pad_n else bias
    try:
        def coarse3(cpad=cpad, bias=bias, block_b=block_b):
            return ps.bucket_min_scan_i8_packed(
                q_i8, cpad, bias, span=4, block_b=block_b, block_n=1024)
        sec = timeit(coarse3)
        emit(exp="coarse_blockb", block_b=block_b, qps=round(B / sec, 0),
             ms=round(sec * 1e3, 2))
        log(f"coarse span=4 block_b={block_b}: {sec*1e3:.1f} ms")
    except Exception as e:
        emit(exp="coarse_blockb", block_b=block_b,
             error=f"{type(e).__name__}: {e}")
    del cpad, bias

log("done")
