"""Build-on-first-use for the native loader library.

Compiles ``loader.cc`` with the system C++ compiler into
``fmri_tpu/native/_cache/loader-<srchash>.so``.  The hash key means a source
edit transparently rebuilds, and a stale cache never loads wrong code.  The
build is a single translation unit (< 1 s with -O3); no cmake/bazel
dependency for users of the Python package.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "loader.cc")
_CACHE = os.path.join(os.path.dirname(__file__), "_cache")


def _compiler() -> str:
    return os.environ.get("CXX", "g++")


def build_library(force: bool = False) -> str:
    """Return the path of the compiled .so, building it if missing."""
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = os.path.join(_CACHE, f"loader-{tag}.so")
    if os.path.exists(out) and not force:
        return out
    os.makedirs(_CACHE, exist_ok=True)
    # Compile to a temp name then rename: concurrent processes racing the
    # first build each produce a complete file; rename is atomic.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CACHE)
    os.close(fd)
    cmd = [_compiler(), "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native build failed ({' '.join(cmd)}):\n{proc.stderr}")
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out
