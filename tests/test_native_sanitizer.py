"""TSan build of the native layer under threaded stress.

The reference runs ASan/TSan CI workflows over its C++ (SURVEY §4.3/§5.2);
here the concurrency-bearing native components (text index mutex, HNSW
builder striped link locks) run under a -fsanitize=thread build in a
fresh subprocess with libtsan preloaded. Any detected race fails via
TSAN exitcode."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STRESS = r"""
import ctypes as ct
import threading
import sys

import numpy as np

lib = ct.CDLL(sys.argv[1])
lib.hnsw_create.restype = ct.c_void_p
lib.hnsw_create.argtypes = [ct.c_int] * 4 + [ct.c_uint64]
lib.hnsw_add_batch_mt.argtypes = [
    ct.c_void_p, ct.POINTER(ct.c_float), ct.c_int32, ct.c_int,
    ct.POINTER(ct.c_int32),
]
lib.hnsw_search.restype = ct.c_int
lib.hnsw_search.argtypes = [
    ct.c_void_p, ct.POINTER(ct.c_float), ct.c_int, ct.c_int,
    ct.POINTER(ct.c_int32), ct.POINTER(ct.c_float),
]

rng = np.random.default_rng(1)
h = lib.hnsw_create(16, 0, 8, 40, 7)
vecs = rng.standard_normal((3000, 16)).astype(np.float32)
out = np.empty(3000, np.int32)
# concurrent batch build across 4 threads (striped locks under test)
lib.hnsw_add_batch_mt(
    h, vecs.ctypes.data_as(ct.POINTER(ct.c_float)), 3000, 4,
    out.ctypes.data_as(ct.POINTER(ct.c_int32)),
)

# text index: 4 threads over one shared index (mutex under test)
lib.lexer_create.restype = ct.c_void_p
lib.lexer_create.argtypes = [ct.c_char_p, ct.c_int, ct.c_char_p,
                             ct.c_int, ct.c_int, ct.c_int]
lib.tix_create.restype = ct.c_void_p
lib.tix_create.argtypes = [ct.c_void_p]
lib.tix_update_field.restype = ct.c_int
lib.tix_update_field.argtypes = [
    ct.c_void_p, ct.c_int32, ct.c_int, ct.c_int, ct.c_char_p, ct.c_int,
    ct.c_char_p, ct.c_int,
]
lib.tix_docs_union.restype = ct.c_int64
lib.tix_docs_union.argtypes = [
    ct.c_void_p, ct.c_char_p, ct.c_int, ct.c_uint64,
    ct.POINTER(ct.c_int64), ct.c_int64,
]
lx = lib.lexer_create(b",.", 2, b"the\x00", 4, 1, 4)
tx = lib.tix_create(lx)

def writer(tid):
    buf = ct.create_string_buffer(1 << 14)
    for i in range(400):
        doc = tid * 1000 + (i % 50)
        text = f"running quickly shared{i % 7} token{tid}".encode()
        n = lib.tix_update_field(tx, doc, 0, 0, text, len(text),
                                 buf, len(buf))
        assert n >= 0

def reader():
    ids = np.empty(1 << 14, np.int64)
    for _ in range(300):
        lib.tix_docs_union(tx, b"running\x00", 1, ~0 & 0xFFFFFFFFFFFFFFFF,
                           ids.ctypes.data_as(ct.POINTER(ct.c_int64)),
                           len(ids))

threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
threads += [threading.Thread(target=reader) for _ in range(2)]
for t in threads:
    t.start()
for t in threads:
    t.join()
print("STRESS-OK")
"""


@pytest.mark.slow
def test_native_layer_under_tsan():
    sys.path.insert(0, os.path.join(REPO, "native"))
    import importlib

    build = importlib.import_module("build")
    try:
        lib = build.lib_path(sanitize="thread")
    except Exception as exc:
        pytest.skip(f"tsan build unavailable: {exc}")
    libtsan = subprocess.run(
        ["g++", "-print-file-name=libtsan.so"],
        capture_output=True, text=True,
    ).stdout.strip()
    env = dict(os.environ)
    env["LD_PRELOAD"] = libtsan
    env["TSAN_OPTIONS"] = "exitcode=66 halt_on_error=1"
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", STRESS, lib],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert p.returncode != 66, f"TSan race detected:\n{p.stderr[-4000:]}"
    assert "STRESS-OK" in p.stdout, (p.returncode, p.stderr[-4000:])


@pytest.mark.slow
def test_native_layer_under_asan():
    """ASan build (heap overflow / UAF detector) over the same stress —
    the reference's ASan workflows analog (unittests-asan.yml)."""
    sys.path.insert(0, os.path.join(REPO, "native"))
    import importlib

    build = importlib.import_module("build")
    try:
        lib = build.lib_path(sanitize="address")
    except Exception as exc:
        pytest.skip(f"asan build unavailable: {exc}")
    libasan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True,
    ).stdout.strip()
    env = dict(os.environ)
    env["LD_PRELOAD"] = libasan
    env["ASAN_OPTIONS"] = (
        "detect_leaks=0:abort_on_error=0:exitcode=77:halt_on_error=1"
    )
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", STRESS, lib],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert p.returncode != 77, f"ASan error:\n{p.stderr[-4000:]}"
    assert "STRESS-OK" in p.stdout, (p.returncode, p.stderr[-4000:])
