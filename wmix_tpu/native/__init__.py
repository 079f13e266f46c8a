"""Native (C) runtime helpers, built lazily with the system toolchain.

The framework's device math is JAX/Pallas; the host runtime keeps a thin
native layer for things that are inherently sequential or latency-critical
(pattern generation, and later the RTP/FIFO packet pumps).  Sources live in
this directory; objects are compiled on first use into ``.cache`` next to
them and reused by mtime.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_CACHE = _DIR / ".cache"


@functools.lru_cache(maxsize=None)
def load(name: str, cflags: tuple = (), deps: tuple = ()) -> ctypes.CDLL:
    """Compile (if needed) and load lib<name>.so from <name>.c.

    ``deps``: extra files (e.g. generated headers) whose mtimes also
    trigger a rebuild.  ``cflags``: extra compiler flags."""
    src = _DIR / f"{name}.c"
    _CACHE.mkdir(exist_ok=True)
    so = _CACHE / f"lib{name}.so"
    newest = max([src.stat().st_mtime] +
                 [Path(d).stat().st_mtime for d in deps])
    if not so.exists() or so.stat().st_mtime < newest:
        cc = os.environ.get("CC", "gcc")
        subprocess.run(
            [cc, "-O2", "-fPIC", "-shared", *cflags, "-o", str(so),
             str(src)],
            check=True)
    return ctypes.CDLL(str(so))
