"""Full-pipeline (span, coarse_factor, block_b, sel_rt) sweep at 1M x 128.

VERDICT r3 next#8: one profiling-driven optimization pass on the fused
scan targeting >= 20% int8 MFU. scripts/profile_scan.py isolated the three
stages (coarse kernel 72-112ms, survivor top-k 46-99ms, rescore 35-51ms at
B=65536); this script sweeps the END-TO-END `flat_topk_fused` config knobs
those findings point at and reports qps + recall@10 + achieved int8 TOPS
per config, so the product default is picked on the full-pipeline frontier
(a faster coarse stage is worthless if selection eats the win).

Timing: dispatch reps async, then ONE 1-element fetch from the last output
as the completion barrier (device executes launches in order). Through the
axon dev tunnel jax.block_until_ready can return BEFORE the computation
finishes (a 95ms kernel timed 0.06ms — profile_sel.py r4), and full-result
pulls ride a 8-170 MB/s bulk link that varies run to run; the scalar fetch
costs one fixed ~60ms RTT, which the 2R-R differencing cancels.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/mfu_sweep.py
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from valkey_search_tpu.runtime import jaxinit  # noqa: E402

jaxinit.init()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from valkey_search_tpu.indexes.flat import FlatVectorIndex  # noqa: E402
from valkey_search_tpu.ops import topk as topk_ops  # noqa: E402
from valkey_search_tpu.runtime import config as cfg  # noqa: E402

# int8 coarse mirror — without this the snapshot has no vectors_i8 and
# flat_topk_fused silently serves the bf16 kernel (first sweep attempt
# measured exactly that: ~500ms/launch, span/cf inert)
cfg.set_config("search.corpus-dtype", "int8")

N, D, B, K = 1_000_000, 128, 65536, 10
N_GT = 256
# v5e int8 peak; MACs = B*N*D per launch, ops = 2*MACs
PEAK_TOPS = 394e12
t0_all = time.perf_counter()


def log(m):
    print(f"[mfu {time.perf_counter()-t0_all:6.1f}s] {m}",
          file=sys.stderr, flush=True)


def sync1(out):
    """1-element completion barrier (see module docstring)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, reps=3):
    def run(k):
        tt = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync1(out)
        return time.perf_counter() - tt

    run(1)  # compile + warm
    t1 = min(run(reps) for _ in range(2))
    t2 = min(run(2 * reps) for _ in range(2))
    return max(t2 - t1, 1e-9) / reps


log(f"backend={jax.default_backend()}")
rng = np.random.default_rng(42)
centers = rng.standard_normal((1024, D)).astype(np.float32) * 60 + 128
assign = rng.integers(0, 1024, size=N)
corpus = np.clip(
    centers[assign] + rng.standard_normal((N, D)).astype(np.float32) * 20,
    0, 255).astype(np.float32)
qa = rng.integers(0, 1024, size=B)
queries = np.clip(
    centers[qa] + rng.standard_normal((B, D)).astype(np.float32) * 20,
    0, 255).astype(np.float32)

idx = FlatVectorIndex(dim=D, metric="l2")
idx.bulk_load([f"m:{i}" for i in range(N)], corpus)
snap = idx.store.device_snapshot()
assert "vectors_i8" in snap, "int8 mirror missing — sweep would silently " \
    "measure the bf16 kernel"
log("mirrors uploaded")

gq = jnp.asarray(queries[:N_GT])
GW = 262144  # exact GT per window: iterative argmin extraction (bench.py
# 10M GT pattern — XLA's wide lax.top_k is pathologically slow here)
vecs_d = snap["vectors"]


def _gt_win(vecs, start, gtq):
    win = jax.lax.dynamic_slice_in_dim(vecs, start, GW)
    wsq = jnp.sum(win * win, axis=1)
    dd = wsq[None, :] - 2.0 * jnp.dot(
        gtq, win.T, precision=jax.lax.Precision.HIGHEST)

    def body(c, _):
        am = jnp.argmin(c, axis=1)
        v = jnp.take_along_axis(c, am[:, None], 1)[:, 0]
        c = c.at[jnp.arange(c.shape[0]), am].set(jnp.inf)
        return c, (v, am)

    _, (v, am) = jax.lax.scan(body, dd, None, length=K)
    return v.T, am.T


_gt_win = jax.jit(_gt_win)
BNv = vecs_d.shape[0]
gstarts = [min(st, BNv - GW) for st in range(0, BNv, GW)]
gouts = [_gt_win(vecs_d, st, gq) for st in gstarts]
cand_v = np.concatenate([np.asarray(v) for v, _ in gouts], axis=1)
cand_i = np.concatenate(
    [np.asarray(am) + st for (_, am), st in zip(gouts, gstarts)], axis=1)
gt = []
for b in range(N_GT):
    _, uniq = np.unique(cand_i[b], return_index=True)
    order = uniq[np.argsort(cand_v[b][uniq], kind="stable")]
    gt.append(set(cand_i[b][order[:K]].tolist()))
log("ground truth done")

qd = jnp.asarray(queries)
cap = snap["vectors"].shape[0]


def launch(span, cf, block_b=None, sel_rt=None):
    return topk_ops.flat_topk_fused(
        qd, snap["vectors"], snap.get("vectors_lp"), k=K, metric="l2",
        corpus_sq=snap["norms_sq"], invalid=snap["invalid"],
        block_rows=cap, corpus_i8=snap.get("vectors_i8"),
        i8_scale=snap.get("i8_scale"), span=span, coarse_factor=cf,
        block_b=block_b, sel_recall_target=sel_rt,
    )


CONFIGS = [
    # (span, cf, block_b, sel_rt) — None = product default. Round 1
    # measured: span4/cf5 401.7k @0.9965 (26.1% MFU), span4/cf4 432.3k
    # @0.9957, span4/cf3 448.2k @0.9910, span8/cf5 462.7k @0.9930,
    # span8/cf6 441.5k @0.9930 (recall survivor-limited at span8 — extra
    # rescore buys nothing); block_b=2048 with block_n=4096 exceeds the
    # 16 MB scoped-VMEM limit (20.25M stack alloc, compile error). This
    # round probes the span8 frontier.
    (8, 4, None, None),
    (8, 3, None, None),
    (8, 5, None, 0.8),    # cheaper selection target
    (16, 5, None, None),  # frontier edge: 512 survivor cols at 1M
]
for span, cf, bb, rt in CONFIGS:
    try:
        d_, i_ = launch(span, cf, bb, rt)
        ii = np.asarray(i_)
        rec = float(np.mean([
            len(set(ii[b, :K].tolist()) & gt[b]) / K for b in range(N_GT)]))
        sec = timeit(lambda: launch(span, cf, bb, rt))
        qps = B / sec
        tops = 2 * B * N * D / sec
        print(json.dumps({
            "span": span, "cf": cf, "block_b": bb, "sel_rt": rt,
            "qps": round(qps, 0), "ms": round(sec * 1e3, 2),
            "recall_at_10": round(rec, 4),
            "int8_tops": round(tops / 1e12, 1),
            "mfu_pct": round(100 * tops / PEAK_TOPS, 1),
        }), flush=True)
        log(f"span={span} cf={cf} bb={bb} rt={rt}: {qps:.0f} qps "
            f"recall={rec:.4f} mfu={100*tops/PEAK_TOPS:.1f}%")
    except Exception as exc:  # noqa: BLE001 — keep sweeping
        print(json.dumps({
            "span": span, "cf": cf, "block_b": bb, "sel_rt": rt,
            "error": f"{type(exc).__name__}: {exc}"}), flush=True)
        log(f"span={span} cf={cf} bb={bb} rt={rt}: FAILED {exc}")
log("done")
