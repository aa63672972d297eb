"""Diagnose the 10M-scan stall seen in the r4 bench run (watchdog killed
the run 946s into `big.search_batch(bq, K)` — BENCH r4 full log).

Times each stage separately at growing N so the blow-up point and stage
are unambiguous: device upload, int8 quantization, bias build, coarse
kernel compile, coarse kernel steady-state, survivor selection, rescore.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_10m.py [N ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from valkey_search_tpu.runtime import jaxinit  # noqa: E402

jaxinit.init()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_log_compiles", True)

from valkey_search_tpu.ops import pallas_scan as ps  # noqa: E402
from valkey_search_tpu.ops import topk as topk_ops  # noqa: E402

D = 128
B = 16384
K = 10


def log(msg):
    print(f"[diag {time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


T0 = time.perf_counter()


def stage(name):
    t = time.perf_counter()

    def done(extra=""):
        log(f"{name}: {time.perf_counter() - t:.1f}s {extra}")

    return done


def run_n(n):
    log(f"===== N={n:,} =====")
    rng = np.random.default_rng(3)
    d = stage("host gen f32")
    centers = rng.integers(0, 256, (1024, D)).astype(np.float32)
    corp = np.empty((n, D), np.float32)
    step = 1_000_000
    for i0 in range(0, n, step):
        m = min(step, n - i0)
        a = rng.integers(0, 1024, m)
        corp[i0:i0 + m] = np.clip(
            centers[a] + rng.standard_normal((m, D), dtype=np.float32) * 20,
            0, 255)
    d()

    d = stage("upload f32")
    dev = jnp.asarray(corp)
    dev.block_until_ready()
    d(f"({dev.nbytes / 2**30:.1f} GiB)")

    d = stage("norms + int8 quant on device")
    norms = jnp.einsum("ij,ij->i", dev, dev)
    scale = jnp.maximum(jnp.max(jnp.abs(dev)) / 127.0, 1e-30).astype(
        jnp.float32)
    c_i8 = jnp.clip(jnp.round(dev / scale), -127, 127).astype(jnp.int8)
    c_i8.block_until_ready()
    norms.block_until_ready()
    d()

    q = jnp.asarray(corp[:B])
    invalid = jnp.zeros(n, bool)

    d = stage("flat_topk_fused FIRST call (compile)")
    dd, ii = topk_ops.flat_topk_fused(
        q, dev, None, K, metric="l2", corpus_sq=norms, invalid=invalid,
        corpus_i8=c_i8, i8_scale=scale,
    )
    np.asarray(dd)
    d()

    t = time.perf_counter()
    for _ in range(3):
        dd, ii = topk_ops.flat_topk_fused(
            q, dev, None, K, metric="l2", corpus_sq=norms, invalid=invalid,
            corpus_i8=c_i8, i8_scale=scale,
        )
        np.asarray(dd)
    qps = 3 * B / (time.perf_counter() - t)
    log(f"qps at N={n:,}: {qps:.0f}")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        log(f"hbm in_use={stats.get('bytes_in_use', 0)/2**30:.1f} GiB "
            f"limit={stats.get('bytes_limit', 0)/2**30:.1f} GiB")
    except Exception:
        pass
    del dev, c_i8, norms, q, dd, ii
    return qps


def main():
    ns = [int(x) for x in sys.argv[1:]] or [2_621_440, 5_242_880, 10_027_008]
    log(f"backend={jax.default_backend()}")
    for n in ns:
        run_n(n)


if __name__ == "__main__":
    main()
