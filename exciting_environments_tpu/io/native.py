"""Build and load the native shard-writer library (ctypes, no pybind11).

The extension is compiled on first use with the system C++ toolchain into a
per-user cache directory and loaded via ``ctypes``; environments without a
compiler transparently fall back to a Python-thread implementation with the
same semantics (see :mod:`exciting_environments_tpu.io.dataset`).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile
from pathlib import Path

_SRC = Path(__file__).resolve().parent / "native" / "shard_writer.cpp"


def _cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache"))
    d = Path(base) / "exciting_environments_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"shard_writer_{tag}.so"
    if out.exists():
        return out
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        raise RuntimeError("no C++ compiler found")
    with tempfile.TemporaryDirectory() as tmp:
        tmp_out = Path(tmp) / out.name
        subprocess.run(
            [cxx, "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread", str(_SRC), "-o", str(tmp_out)],
            check=True,
            capture_output=True,
        )
        os.replace(tmp_out, out)  # atomic publish
    return out


_lib = None


def load_native():
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_build()))
    lib.shard_writer_open.restype = ctypes.c_void_p
    lib.shard_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.shard_writer_write.restype = ctypes.c_int
    lib.shard_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.shard_writer_close.restype = ctypes.c_uint64
    lib.shard_writer_close.argtypes = [ctypes.c_void_p]
    lib.shard_writer_pending.restype = ctypes.c_uint64
    lib.shard_writer_pending.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        load_native()
        return True
    except Exception:
        return False
