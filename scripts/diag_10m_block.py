"""Stage-2 diagnosis of the r4 10M-scan stall: same 10M corpus, one
upload, then each suspect configuration timed separately —

  1. the survivor-selection op alone at bench shape ([B, 19584] i32)
  2. blocked scan (9 x 1,114,112-row blocks + merge)
  3. single-block scan over all 10,027,008 rows (the bench's config)

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_10m_block.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from valkey_search_tpu.runtime import jaxinit  # noqa: E402

jaxinit.init()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from valkey_search_tpu.ops import topk as topk_ops  # noqa: E402

D = 128
B = 16384
K = 10
N = 10_027_008

T0 = time.perf_counter()


def log(msg):
    print(f"[diag2 {time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(3)
    centers = rng.integers(0, 256, (1024, D)).astype(np.float32)
    corp = np.empty((N, D), np.float32)
    for i0 in range(0, N, 1_000_000):
        m = min(1_000_000, N - i0)
        a = rng.integers(0, 1024, m)
        corp[i0:i0 + m] = np.clip(
            centers[a] + rng.standard_normal((m, D), dtype=np.float32) * 20,
            0, 255)
    log("host gen done")

    t = time.perf_counter()
    dev = jnp.asarray(corp)
    dev.block_until_ready()
    log(f"upload {dev.nbytes/2**30:.1f} GiB: {time.perf_counter()-t:.0f}s")
    norms = jnp.einsum("ij,ij->i", dev, dev)
    scale = jnp.maximum(jnp.max(jnp.abs(dev)) / 127.0, 1e-30).astype(
        jnp.float32)
    c_i8 = jnp.clip(jnp.round(dev / scale), -127, 127).astype(jnp.int8)
    c_i8.block_until_ready()
    q = jnp.asarray(corp[:B])
    invalid = jnp.zeros(N, bool)
    log("mirrors ready")

    # (the raw approx_min_k at [B, 19584] is known-wedged through axon —
    # r4 diag run 1 sat >8 min in that single op; the scan now chunks
    # selection to 2048-column rows, tested below via both paths)

    # -- blocked vs single-block scan ---------------------------------------
    def run(block_rows, label):
        t = time.perf_counter()
        dd, ii = topk_ops.flat_topk_fused(
            q, dev, None, K, metric="l2", corpus_sq=norms,
            invalid=invalid, corpus_i8=c_i8, i8_scale=scale,
            block_rows=block_rows,
        )
        np.asarray(dd)
        log(f"{label} first call: {time.perf_counter()-t:.1f}s")
        t = time.perf_counter()
        for _ in range(3):
            dd, ii = topk_ops.flat_topk_fused(
                q, dev, None, K, metric="l2", corpus_sq=norms,
                invalid=invalid, corpus_i8=c_i8, i8_scale=scale,
                block_rows=block_rows,
            )
            np.asarray(dd)
        qps = 3 * B / (time.perf_counter() - t)
        log(f"{label} steady: {qps:.0f} qps")

    run(1_114_112, "blocked 9x1.11M")
    run(N, "single-block 10M")


if __name__ == "__main__":
    main()
