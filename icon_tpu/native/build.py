"""Build the native host runtime (g++ -> cached .so).

The shared object is rebuilt whenever the source hash changes; concurrent
builders (test workers) race safely via an atomic rename. No pybind11 in the
image, so bindings are plain ``extern "C"`` + ctypes (which releases the GIL
for the duration of every call — the property the threaded DataLoader needs).
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
import subprocess
import tempfile

_SRC_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "src")
_CACHE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "_build")

_SOURCES = ("imagecodec.cc", "latticecodec.cc")
_CXXFLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-Wall", "-Werror"]
_LIBS = ["-lz"]


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in _SOURCES:
        with open(osp.join(_SRC_DIR, name), "rb") as f:
            h.update(f.read())
    h.update(" ".join(_CXXFLAGS + _LIBS).encode())
    return h.hexdigest()[:16]


def build(verbose: bool = False) -> str:
    """Compile (if needed) and return the .so path."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = osp.join(_CACHE_DIR, f"libiconhost-{_source_hash()}.so")
    if osp.exists(so_path):
        return so_path
    srcs = [osp.join(_SRC_DIR, s) for s in _SOURCES]
    with tempfile.NamedTemporaryFile(
            suffix=".so", dir=_CACHE_DIR, delete=False) as tmp:
        tmp_path = tmp.name
    cmd = ["g++", *_CXXFLAGS, *srcs, "-o", tmp_path, *_LIBS]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        os.replace(tmp_path, so_path)     # atomic under concurrent builds
    except BaseException:
        if osp.exists(tmp_path):
            os.unlink(tmp_path)
        raise
    return so_path
