"""Build the native library (g++ → libvstpu_native.so), cached by source hash."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
BUILD_DIR = os.path.join(NATIVE_DIR, "build")
SOURCES = ["hnsw_builder.cpp", "text_core.cpp", "text_index.cpp"]
LIB_NAME = "libvstpu_native.so"

CXX_FLAGS = [
    "-O3",
    "-march=native",
    "-std=c++17",
    "-shared",
    "-fPIC",
    "-Wall",
    "-fno-exceptions",
]


def _source_hash() -> str:
    h = hashlib.sha256()
    for src in SOURCES:
        with open(os.path.join(NATIVE_DIR, src), "rb") as f:
            h.update(f.read())
    h.update(" ".join(CXX_FLAGS).encode())
    return h.hexdigest()[:16]


def lib_path(sanitize: str = "") -> str:
    """Return the path to the built shared library, building if stale.

    sanitize="thread" builds a TSan-instrumented variant (the CI analog
    of the reference's TSan unit workflows, SURVEY §5.2) — load it with
    LD_PRELOAD=libtsan.so in a fresh process.
    """
    os.makedirs(BUILD_DIR, exist_ok=True)
    tag = _source_hash() + (f"-{sanitize}" if sanitize else "")
    name = LIB_NAME if not sanitize else LIB_NAME.replace(
        ".so", f"_{sanitize}.so")
    lib = os.path.join(BUILD_DIR, name)
    stamp = os.path.join(BUILD_DIR, f"source.hash.{sanitize or 'plain'}")
    if os.path.exists(lib) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == tag:
                return lib
    srcs = [os.path.join(NATIVE_DIR, s) for s in SOURCES]
    flags = list(CXX_FLAGS)
    if sanitize:
        flags = [f for f in flags if f != "-fno-exceptions"]
        flags += [f"-fsanitize={sanitize}", "-O1", "-g"]
    cmd = ["g++", *flags, "-o", lib, *srcs]
    subprocess.run(cmd, check=True)
    with open(stamp, "w") as f:
        f.write(tag)
    return lib


if __name__ == "__main__":
    print(lib_path())
    sys.exit(0)
