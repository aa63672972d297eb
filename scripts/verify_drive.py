"""End-to-end drive of the engine's argv surface on the real TPU.

Covers the verify-skill flows: HNSW+TAG+NUMERIC schema, HSET ingest, pure
KNN, hybrid filter, non-vector + SORTBY, mutation visibility, FT.INFO,
recall vs numpy ground truth, and typed error probes. Exits 0 iff every
check passes and the backend is the real chip (pass --allow-cpu to relax
for smoke runs).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "--allow-cpu" in sys.argv:
    # the axon sitecustomize sets the jax_platforms *config* (which beats
    # the env var), so pin the config explicitly before anything runs
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

from valkey_search_tpu.runtime import jaxinit  # noqa: E402

jaxinit.init()

import jax  # noqa: E402

from valkey_search_tpu.server import Engine  # noqa: E402
from valkey_search_tpu.server.engine import CommandError  # noqa: E402

checks = []


def check(name, ok, detail=""):
    checks.append((name, bool(ok)))
    print(f"[drive] {'ok ' if ok else 'FAIL'} {name} {detail}", flush=True)


def kernel_equality_checks():
    """Assert kernel-vs-exact equality for all three device kernel
    families on the live backend (ops/pallas_scan.py + ops/ivf.py)."""
    import jax.numpy as jnp

    from valkey_search_tpu.indexes.flat import FlatVectorIndex
    from valkey_search_tpu.ops import ivf as ivf_ops
    from valkey_search_tpu.ops import topk as topk_ops
    from valkey_search_tpu.runtime import config as cfg

    n, d, k, nb_q = 262_144, 128, 10, 256
    rng = np.random.default_rng(97)
    centers = rng.standard_normal((256, d)).astype(np.float32) * 60 + 128

    def draw(m, noise=20.0):
        a = rng.integers(0, 256, m)
        z = rng.standard_normal((m, d)).astype(np.float32) * noise
        return np.clip(centers[a] + z, 0, 255).astype(np.float32)

    corpus = draw(n)
    queries = draw(nb_q)
    # exact fp64 oracle (host BLAS, same form as bench.py ground truth)
    c64 = corpus.astype(np.float64)
    c64_sq = np.einsum("ij,ij->i", c64, c64)
    gt_ids, gt_d = [], []
    for q in queries.astype(np.float64):
        dd = c64_sq - 2.0 * (c64 @ q) + np.dot(q, q)
        part = np.argpartition(dd, k)[:k]
        order = part[np.argsort(dd[part])]
        gt_ids.append(order)
        gt_d.append(dd[order])
    gt_sets = [set(g.tolist()) for g in gt_ids]

    def exact_d(b, row_ids):
        """fp64 exact distances of specific rows for query b."""
        q64 = queries[b].astype(np.float64)
        return c64_sq[row_ids] - 2.0 * (c64[row_ids] @ q64) + q64 @ q64

    def run_check(name, dists, ids, floor):
        rec = float(np.mean([
            len(set(ids[b, :k].tolist()) & gt_sets[b]) / k
            for b in range(nb_q)
        ]))
        # returned distances must be the EXACT fp32 distance of the
        # returned id (the rescore contract), not the coarse score.
        # Tolerance: distances here are ~4e6 in magnitude (byte-valued
        # 128-d rows), so a few f32 ulps is ~1-2 absolute (measured 1.52);
        # an int8-coarse-score leak is off by tens-to-hundreds.
        derr = float(np.max([
            np.abs(dists[b] - exact_d(b, ids[b])).max()
            for b in range(nb_q)
        ]))
        check(name, rec >= floor and derr < 4.0,
              f"recall={rec:.4f} maxdisterr={derr:.2e}")

    keys = [f"kq:{i}" for i in range(n)]
    cfg.set_config("search.ivf-threshold", str(n * 10))  # pin: scan paths
    try:
        for dtype in ("int8", "bfloat16"):
            cfg.set_config("search.corpus-dtype", dtype)
            idx = FlatVectorIndex(dim=d, metric="l2")
            idx.bulk_load(keys, corpus)
            snap = idx.store.device_snapshot()
            assert topk_ops.use_fused_scan(snap["vectors"].shape[0], None)
            dists, ids = idx.search_batch(queries, k)
            # 0.99 = the engine's own recall gate at every scale; a Mosaic
            # layout regression craters this to <0.9 (measured operating
            # points here: int8 0.9977, bf16 0.9961)
            run_check(f"kernel_{dtype}_vs_exact", dists, ids, 0.99)
        # IVF coarse + exact rescore vs the oracle on the same corpus
        cfg.set_config("search.corpus-dtype", "int8")
        fx = FlatVectorIndex(dim=d, metric="l2")
        fx.bulk_load(keys, corpus)
        snap = fx.store.device_snapshot()
        iv = ivf_ops.build_ivf_device(snap["vectors"],
                                      present=fx.store.present)
        dd2, ii2 = ivf_ops.ivf_search_rescored(
            iv, jnp.asarray(queries), snap["vectors"], k=k, probe=16)
        run_check("kernel_ivf_rescored_vs_exact",
                  np.asarray(dd2), np.asarray(ii2), 0.97)
    finally:
        cfg.REGISTRY.reset_all()


def main():
    allow_cpu = "--allow-cpu" in sys.argv
    backend = jax.default_backend()
    print(f"[drive] backend={backend} devices={jax.devices()}", flush=True)
    if backend != "tpu" and not allow_cpu:
        print("[drive] FATAL: not on the real chip", flush=True)
        sys.exit(2)

    rng = np.random.default_rng(3)
    d = 32
    n = 3000
    corpus = rng.standard_normal((n, d)).astype(np.float32)

    e = Engine()
    t0 = time.perf_counter()
    e.execute(
        "FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "doc:",
        "SCHEMA", "v", "VECTOR", "HNSW", "12", "TYPE", "FLOAT32",
        "DIM", str(d), "DISTANCE_METRIC", "L2", "M", "8",
        "EF_CONSTRUCTION", "80", "EF_RUNTIME", "60",
        "tag", "TAG", "num", "NUMERIC",
    )
    for i in range(n):
        e.execute(
            "HSET", f"doc:{i}", "v", corpus[i].tobytes(),
            "tag", "red" if i % 3 == 0 else "blue", "num", str(i),
        )
    print(f"[drive] ingest {n} docs in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # --- pure KNN + recall vs numpy ground truth -------------------------
    k = 10
    q = corpus[17] + rng.standard_normal(d).astype(np.float32) * 0.05
    t0 = time.perf_counter()
    r = e.execute("FT.SEARCH", "idx", f"*=>[KNN {k} @v $q]",
                  "PARAMS", "2", "q", q.tobytes(), "NOCONTENT")
    knn_s = time.perf_counter() - t0
    got = {str(x) for x in r[1:]}
    dd = np.einsum("ij,ij->i", corpus - q, corpus - q)
    gt = {f"doc:{i}" for i in np.argsort(dd)[:k]}
    rec = len(got & gt) / k
    check("knn_recall>=0.9", rec >= 0.9, f"recall={rec:.2f} ({knn_s*1e3:.0f}ms first)")

    # --- hybrid filter ---------------------------------------------------
    r = e.execute(
        "FT.SEARCH", "idx", f"(@tag:{{red}} @num:[0 1500])=>[KNN {k} @v $q]",
        "PARAMS", "2", "q", q.tobytes(), "NOCONTENT")
    ids = [int(str(x).split(":")[1]) for x in r[1:]]
    check("hybrid_filter", r[0] >= 1 and
          all(i % 3 == 0 and i <= 1500 for i in ids), f"n={r[0]}")

    # --- non-vector + SORTBY --------------------------------------------
    r = e.execute("FT.SEARCH", "idx", "@num:[100 110]",
                  "SORTBY", "num", "DESC", "NOCONTENT")
    ids = [int(str(x).split(":")[1]) for x in r[1:]]
    check("sortby_desc", ids == sorted(ids, reverse=True) and r[0] == 11,
          f"ids={ids[:4]}..")

    # --- mutation visibility --------------------------------------------
    far = (corpus[0] + 100.0).astype(np.float32)
    e.execute("HSET", "doc:17", "v", far.tobytes(), "tag", "red", "num", "17")
    r = e.execute("FT.SEARCH", "idx", f"*=>[KNN {k} @v $q]",
                  "PARAMS", "2", "q", q.tobytes(), "NOCONTENT")
    got = {str(x) for x in r[1:]}
    check("update_visible", "doc:17" not in got)
    e.execute("DEL", "doc:42")
    r = e.execute("FT.SEARCH", "idx", f"*=>[KNN {n} @v $q]"[:200],
                  "PARAMS", "2", "q", q.tobytes(), "NOCONTENT", "LIMIT", "0",
                  str(n))
    got = {str(x) for x in r[1:]}
    check("delete_visible", "doc:42" not in got)

    # --- FT.INFO ---------------------------------------------------------
    info = e.execute("FT.INFO", "idx")
    imap = {str(info[i]): info[i + 1] for i in range(0, len(info) - 1, 2)}
    check("ft_info_docs", int(imap.get("num_docs", 0)) == n - 1,
          f"num_docs={imap.get('num_docs')}")

    # --- FT.AGGREGATE ----------------------------------------------------
    r = e.execute("FT.AGGREGATE", "idx", "@num:[0 99]",
                  "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    rows = r[1:]
    total = 0
    for row in rows:
        m = {str(row[i]): row[i + 1] for i in range(0, len(row) - 1, 2)}
        total += int(m.get("c", 0))
    # doc:42 was deleted above, so [0,99] holds 99 docs
    check("aggregate_groupby", total == 99 and len(rows) == 2,
          f"rows={len(rows)} total={total}")

    # --- aggregate DIALECT 3 on JSON (bracket wrapping) -------------------
    e.execute("FT.CREATE", "jd", "ON", "JSON", "PREFIX", "1", "jd:",
              "SCHEMA", "$.n", "AS", "n", "NUMERIC")
    e.execute("JSON.SET", "jd:1", "$", '{"n": 7}')
    r = e.execute("FT.AGGREGATE", "jd", "@n:[0 9]", "LOAD", "1", "@n",
                  "DIALECT", "3")
    row = {str(r[1][i]): r[1][i + 1] for i in range(0, len(r[1]), 2)}
    check("aggregate_dialect3_json", str(row.get("n", "")).startswith("["),
          f"n={row.get('n')!r}")

    # --- hash-field expiration (HFE) --------------------------------------
    e.execute("HSET", "hfe:1", "tag", "ephemeral", "num", "5")
    e.execute("FT.CREATE", "hfe", "ON", "HASH", "PREFIX", "1", "hfe:",
              "SCHEMA", "tag", "TAG", "num", "NUMERIC")
    got1 = e.execute("HEXPIRE", "hfe:1", "100", "FIELDS", "1", "tag")
    ttl = e.execute("HTTL", "hfe:1", "FIELDS", "1", "tag")[0]
    got2 = e.execute("HEXPIRE", "hfe:1", "0", "FIELDS", "1", "tag")
    gone = e.execute("FT.SEARCH", "hfe", "@tag:{ephemeral}", "NOCONTENT")[0]
    kept = e.execute("FT.SEARCH", "hfe", "@num:[5 5]", "NOCONTENT")[0]
    check("hfe_expire_reindex",
          got1 == [1] and 95 <= ttl <= 100 and got2 == [2]
          and gone == 0 and kept == 1,
          f"ttl={ttl} gone={gone} kept={kept}")

    # --- full-text flow ---------------------------------------------------
    e.execute("FT.CREATE", "txt", "ON", "HASH", "PREFIX", "1", "b:",
              "SCHEMA", "body", "TEXT", "WITHSUFFIXTRIE", "cat", "TAG")
    bodies = ["the quick brown fox", "quick search engines running",
              "a lazy dog sleeps", "search engine optimization",
              "foxes run quickly"]
    for i, t in enumerate(bodies):
        e.execute("HSET", f"b:{i}", "body", t, "cat",
                  "a" if i % 2 == 0 else "b")
    r = e.execute("FT.SEARCH", "txt", "@body:quick", "NOCONTENT")
    got = {str(x) for x in r[1:]}
    # 'quickly' stems to 'quick' — stemmed match pulls in b:4
    check("text_term_stem", got == {"b:0", "b:1", "b:4"}, f"got={sorted(got)}")
    r = e.execute("FT.SEARCH", "txt", '"search engine"', "NOCONTENT")
    check("text_phrase", {str(x) for x in r[1:]} == {"b:1", "b:3"})
    r = e.execute("FT.SEARCH", "txt", "@body:fox*", "NOCONTENT")
    check("text_prefix", {str(x) for x in r[1:]} == {"b:0", "b:4"})
    r = e.execute("FT.SEARCH", "txt", "@body:%foz%", "NOCONTENT")
    check("text_fuzzy", "b:0" in {str(x) for x in r[1:]})
    r = e.execute("FT.SEARCH", "txt", "(@cat:{a} @body:fox*)", "NOCONTENT")
    check("text_hybrid_tag", {str(x) for x in r[1:]} == {"b:0", "b:4"})

    # --- multi-DB over the wire surface ----------------------------------
    from valkey_search_tpu.server.resp import RespServer

    srv = RespServer(e, port=0).start()
    try:
        import socket as _socket

        s = _socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        f = s.makefile("rwb")

        def wire(*argv):
            out = b"*%d\r\n" % len(argv)
            for a in argv:
                b = a if isinstance(a, bytes) else str(a).encode()
                out += b"$%d\r\n%s\r\n" % (len(b), b)
            f.write(out)
            f.flush()
            line = f.readline()
            if line[:1] == b"$":
                n = int(line[1:])
                return f.read(n + 2)[:-2] if n >= 0 else None
            return line[1:-2]

        wire("SELECT", "1")
        wire("HSET", "mk", "f", "one")
        v1 = wire("HGET", "mk", "f")
        wire("SELECT", "0")
        v0 = wire("EXISTS", "mk")
        wire("SWAPDB", "0", "1")
        v2 = wire("HGET", "mk", "f")
        check("multidb_select_swapdb",
              v1 == b"one" and v0 == b"0" and v2 == b"one")

        # pub/sub + keyspace notifications over a second connection
        wire("CONFIG", "SET", "search.notify-keyspace-events", "KEA")
        s2 = _socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        f2 = s2.makefile("rwb")

        def read_frame():
            import re as _re

            line = f2.readline()
            assert line[:1] in (b"*", b">"), line
            n = int(line[1:])
            out = []
            for _ in range(n):
                h = f2.readline()
                if h[:1] == b"$":
                    ln = int(h[1:])
                    out.append(f2.read(ln + 2)[:-2])
                else:
                    out.append(int(_re.sub(rb"[^0-9-]", b"", h) or 0))
            return out

        f2.write(b"*2\r\n$9\r\nSUBSCRIBE\r\n$22\r\n__keyevent@0__:hset\r\n"
                 .replace(b"$22", b"$19"))
        f2.flush()
        ack = read_frame()
        wire("HSET", "pub:1", "f", "v")
        msg = read_frame()
        check("pubsub_keyspace_event",
              ack[0] == b"subscribe" and
              msg == [b"message", b"__keyevent@0__:hset", b"pub:1"],
              f"msg={msg}")
        f2.close(); s2.close()
        f.close(); s.close()
    finally:
        srv.close()

    # --- on-chip kernel correctness gate ----------------------------------
    # VERDICT r4 next#7: CI pins tests to the CPU mesh, so the Pallas
    # kernels' Mosaic lowering is otherwise evidenced only by bench recall
    # aggregates — a layout regression would surface as a silent recall
    # dip. Here every kernel family (fused int8 packed scan, bf16
    # two-stage, IVF coarse+rescore) is checked against the exact XLA
    # fp32 scan ON THE REAL CHIP: ids must match up to the documented
    # over-retrieval tolerance and returned distances must be exact.
    if backend == "tpu":
        kernel_equality_checks()

    # --- error probes ----------------------------------------------------
    def expect_err(name, *argv):
        try:
            e.execute(*argv)
            check(name, False, "no error raised")
        except (CommandError, ValueError, KeyError) as exc:
            check(name, True, type(exc).__name__)

    expect_err("err_unknown_index", "FT.SEARCH", "nope", "*")
    expect_err("err_unterminated_brace", "FT.SEARCH", "idx", "@tag:{red")
    expect_err("err_missing_params", "FT.SEARCH", "idx", "*=>[KNN 3 @v $q]")
    expect_err("err_wrong_dim", "FT.SEARCH", "idx", "*=>[KNN 3 @v $q]",
               "PARAMS", "2", "q", b"\x00" * 8)
    expect_err("err_knn_nonvector", "FT.SEARCH", "idx", "*=>[KNN 3 @num $q]",
               "PARAMS", "2", "q", q.tobytes())
    expect_err("err_dup_index", "FT.CREATE", "idx", "SCHEMA", "x", "TAG")

    bad = [nm for nm, ok in checks if not ok]
    print(f"[drive] {len(checks)-len(bad)}/{len(checks)} checks passed",
          flush=True)
    if bad:
        print(f"[drive] FAILED: {bad}", flush=True)
        sys.exit(1)
    print("[drive] ALL OK", flush=True)


if __name__ == "__main__":
    main()
