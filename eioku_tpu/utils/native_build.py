"""Build-and-load for the framework's native C++ helpers.

One shared recipe for every `native/*.cpp` component (WordPiece matcher, DTW
aligner): compile with g++ on first use, cache the .so next to the source,
and fall back cleanly (return None) when no toolchain exists so callers keep
their pure-Python paths. The compile writes to a per-process temp file and
os.rename()s it into place — many worker processes starting together (the
multi-host fleet case) must never dlopen a half-written library.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

log = logging.getLogger(__name__)

_lock = threading.Lock()
_cache: dict[str, ctypes.CDLL | None] = {}

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")


def load_native_lib(name: str, configure,
                    link_libs: tuple[str, ...] = ()) -> ctypes.CDLL | None:
    """Load native/{name}.cpp as native/lib{name}.so, building if stale.

    `configure(lib)` sets restype/argtypes; it runs once per process.
    `link_libs` adds -l<lib> flags (e.g. the FFmpeg libraries for the audio
    shim). Returns None (and remembers the failure) when the toolchain, the
    source, or a linked system library is missing.
    """
    with _lock:
        if name in _cache:
            return _cache[name]
        src = os.path.join(NATIVE_DIR, f"{name}.cpp")
        lib_path = os.path.join(NATIVE_DIR, f"lib{name}.so")
        try:
            if not os.path.isfile(lib_path) or \
                    os.path.getmtime(lib_path) < os.path.getmtime(src):
                tmp = f"{lib_path}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", tmp, src] + [f"-l{lib}" for lib in link_libs],
                    check=True, capture_output=True, timeout=120)
                os.rename(tmp, lib_path)  # atomic: concurrent starters race
            lib = ctypes.CDLL(lib_path)
            configure(lib)
            _cache[name] = lib
        except Exception as e:
            log.warning("native %s unavailable (%s); using Python path",
                        name, e)
            _cache[name] = None
        return _cache[name]
