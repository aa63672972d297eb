"""Measure the REFERENCE's own ANN engine head-to-head (BASELINE.md).

Builds scripts/ref_hnsw_baseline.cpp against the reference's vendored
hnswlib headers (read-only include of /root/reference/third_party — the
exact engine valkey-search serves with), generates the SAME corpus as
bench.py (seed 42, clustered bytes), and records build rate + QPS/recall
at the reference defaults (M=16, efC=200; ef sweep 10/50/100).

The full valkey-search server cannot be built here: its configure stage
fetches gRPC/protobuf/abseil from the network
(/root/reference/submodules/CMakeLists.txt) and this environment has no
egress (verified: HTTP 000 to github.com), and no system gRPC/absl is
installed for --use-system-modules. The vendored-engine measurement is
the honest stand-in: valkey-search's query path per core IS an hnswlib
searchKnn walk plus command plumbing.

Usage: python scripts/ref_baseline.py [N] [--out baseline_ref.json]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("VSTPU_REFERENCE", "/root/reference")


def build_harness(out_dir: str) -> str:
    # the vendored hnswlib serializes via a protobuf schema; generate its
    # C++ from the reference's own index.proto with the system protoc
    subprocess.run(
        ["protoc", f"--cpp_out={out_dir}", f"-I{REF}",
         "third_party/hnswlib/index.proto"],
        check=True,
    )
    pb_flags = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "protobuf"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    exe = os.path.join(out_dir, "ref_hnsw_baseline")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++20", "-DNDEBUG",
        os.path.join(REPO, "scripts", "ref_hnsw_baseline.cpp"),
        os.path.join(out_dir, "third_party", "hnswlib", "index.pb.cc"),
        # SimSIMD's dynamic-dispatch unit, compiled once exactly as the
        # reference's CMake does (third_party/hnswlib/CMakeLists.txt:16)
        "-x", "c", os.path.join(REF, "third_party", "simsimd", "c", "lib.c"),
        f"-I{os.path.join(REF, 'third_party', 'simsimd', 'include')}",
        f"-I{os.path.join(REPO, 'scripts', 'absl_shim')}",
        f"-I{os.path.join(REF, 'third_party', 'hnswlib')}",
        f"-I{REF}",  # third_party/simsimd/include/... resolves from root
        f"-I{out_dir}",  # generated index.pb.h
        "-o", exe,
    ] + pb_flags
    subprocess.run(cmd, check=True)
    return exe


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_000_000
    d, k, nq = 128, 10, 1024
    rng = np.random.default_rng(42)  # bench.py's corpus recipe, same seed
    n_centers = 1024
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 60 + 128
    assign = rng.integers(0, n_centers, size=n)
    corpus = np.clip(
        centers[assign] + rng.standard_normal((n, d)).astype(np.float32) * 20,
        0, 255,
    ).astype(np.float32)
    q_assign = rng.integers(0, n_centers, size=nq)
    queries = np.clip(
        centers[q_assign]
        + rng.standard_normal((nq, d)).astype(np.float32) * 20,
        0, 255,
    ).astype(np.float32)

    print(f"[ref-baseline] ground truth ({nq} queries)...", file=sys.stderr)
    c_sq = np.einsum("ij,ij->i", corpus, corpus)
    gt = np.empty((nq, k), np.int64)
    for i0 in range(0, nq, 128):
        q_blk = queries[i0:i0 + 128]
        dd = c_sq[None, :] - 2.0 * (q_blk @ corpus.T)
        part = np.argpartition(dd, k, axis=1)[:, :k]
        rows = np.arange(len(q_blk))[:, None]
        order = np.argsort(dd[rows, part], axis=1)
        gt[i0:i0 + len(q_blk)] = part[rows, order]

    with tempfile.TemporaryDirectory() as td:
        cp = os.path.join(td, "corpus.f32")
        qp = os.path.join(td, "queries.f32")
        gp = os.path.join(td, "gt.i64")
        corpus.tofile(cp)
        queries.tofile(qp)
        gt.tofile(gp)
        print("[ref-baseline] compiling reference hnswlib harness...",
              file=sys.stderr)
        exe = build_harness(td)
        print(f"[ref-baseline] building reference HNSW on {n} vectors "
              "(M=16, efC=200, 1 core)...", file=sys.stderr)
        t0 = time.time()
        out = subprocess.run(
            [exe, cp, qp, str(n), str(d), str(nq), "16", "200", str(k), gp],
            capture_output=True, text=True, check=True,
        )
        res = json.loads(out.stdout)
        res.update({
            "n": n, "d": d, "k": k, "nq": nq,
            "engine": "reference vendored hnswlib "
                      "(third_party/hnswlib @ /root/reference)",
            "config": "M=16 efC=200 (reference defaults, "
                      "docs/commands/ft.create.md:86-89)",
            "wall_s": round(time.time() - t0, 1),
        })
    line = json.dumps(res)
    print(line)
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            out_path = sys.argv[i + 1]
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
