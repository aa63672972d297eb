"""Profile survivor-selection and rescore alternatives on real shapes.

The fused-scan pipeline at 1M x 128, B=65536 spends ~110ms in the coarse
Pallas kernel but 99-184ms in approx_min_k over the survivor array and
92-108ms in the fp32 gather+rescore (profile_scan.py r4 data). This script
measures drop-in alternatives for both stages.
"""
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

B = int(os.environ.get("PROF_B", "65536"))
N = 1_000_000
D = 128
t0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-t0:6.1f}s] {m}", file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


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


rng = np.random.default_rng(1)
log(f"backend={jax.default_backend()} B={B}")

# ---- survivor-selection candidates over [B, cols] -------------------------
for cols in (2048, 3968, 7936):
    pf_h = rng.integers(0, 2**30, size=(B, cols), dtype=np.int32)
    pf = jax.block_until_ready(
        jax.lax.bitcast_convert_type(jnp.asarray(pf_h), jnp.float32))
    kk = 50

    @functools.partial(jax.jit, static_argnames=("rt", "agg"))
    def amin(pf, rt, agg):
        return jax.lax.approx_min_k(
            pf, kk, recall_target=rt, aggregate_to_topk=agg)

    for rt in (0.8, 0.95, 0.98):
        sec = timeit(lambda rt=rt, pf=pf: amin(pf, rt, True))
        emit(exp="approx_min_k", cols=cols, rt=rt, agg=True,
             ms=round(sec * 1e3, 2))
        log(f"approx cols={cols} rt={rt} agg=True: {sec*1e3:.1f} ms")
    sec = timeit(lambda pf=pf: amin(pf, 0.95, False))
    out_l = amin(pf, 0.95, False)[0].shape[-1]
    emit(exp="approx_min_k", cols=cols, rt=0.95, agg=False,
         out_l=out_l, ms=round(sec * 1e3, 2))
    log(f"approx cols={cols} agg=False (l={out_l}): {sec*1e3:.1f} ms")

    @jax.jit
    def full_topk(pf):
        nt, pos = jax.lax.top_k(-pf, kk)
        return -nt, pos
    sec = timeit(lambda pf=pf: full_topk(pf))
    emit(exp="top_k", cols=cols, ms=round(sec * 1e3, 2))
    log(f"top_k cols={cols}: {sec*1e3:.1f} ms")

    # integer variant: top_k on the raw int32 keys (no bitcast view)
    pi = jnp.asarray(pf_h)

    @jax.jit
    def int_topk(pi):
        nt, pos = jax.lax.top_k(-pi, kk)
        return -nt, pos
    sec = timeit(lambda pi=pi: int_topk(pi))
    emit(exp="top_k_int", cols=cols, ms=round(sec * 1e3, 2))
    log(f"top_k int cols={cols}: {sec*1e3:.1f} ms")
    del pf, pf_h, pi

# ---- rescore components over [B, C] candidates ----------------------------
corpus = jnp.asarray(
    rng.standard_normal((N, D)).astype(np.float32))
queries = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
jax.block_until_ready((corpus, queries))
for C in (30, 50):
    ci = jnp.asarray(rng.integers(0, N, size=(B, C)), jnp.int32)

    @jax.jit
    def gather_only(ci):
        return jnp.take(corpus, ci, axis=0)  # [B, C, D]
    sec = timeit(lambda ci=ci: gather_only(ci))
    emit(exp="rescore_gather", C=C, ms=round(sec * 1e3, 2),
         gb=round(B * C * D * 4 / 2**30, 2))
    log(f"gather C={C}: {sec*1e3:.1f} ms")

    @jax.jit
    def gather_flat(ci):
        # flattened-index gather: one [B*C] take instead of [B, C]
        return jnp.take(corpus, ci.reshape(-1), axis=0)
    sec = timeit(lambda ci=ci: gather_flat(ci))
    emit(exp="rescore_gather_flat", C=C, ms=round(sec * 1e3, 2))
    log(f"gather flat C={C}: {sec*1e3:.1f} ms")

    cand = jax.block_until_ready(gather_only(ci))

    @jax.jit
    def score_only(cand, queries):
        # l2 via ||c||^2 - 2 q.c (batched einsum over [B, C, D])
        csq = jnp.einsum("bcd,bcd->bc", cand, cand)
        dots = jnp.einsum("bd,bcd->bc", queries, cand)
        d = csq - 2 * dots
        nt, pos = jax.lax.top_k(-d, 10)
        return -nt, pos
    sec = timeit(lambda: score_only(cand, queries))
    emit(exp="rescore_score", C=C, ms=round(sec * 1e3, 2))
    log(f"score C={C}: {sec*1e3:.1f} ms")

    # int8 gather variant (4x less traffic)
    c_i8 = jnp.clip(jnp.round(corpus * 30), -127, 127).astype(jnp.int8)
    jax.block_until_ready(c_i8)

    @jax.jit
    def gather_i8(ci):
        return jnp.take(c_i8, ci, axis=0)
    sec = timeit(lambda ci=ci: gather_i8(ci))
    emit(exp="rescore_gather_i8", C=C, ms=round(sec * 1e3, 2))
    log(f"gather i8 C={C}: {sec*1e3:.1f} ms")
    del ci, cand, c_i8

log("done")
