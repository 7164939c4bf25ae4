"""Persistent XLA compilation cache for the framework's entry points.

On the tunneled TPU platform every program compile is a server-side round
trip: a train step costs 20-40 s, and a fresh process additionally pays a
1-3 minute eager-init warmup of small programs (CLAUDE.md).  JAX's
persistent compilation cache removes both on every start after the first —
measured on the WAE stage-1 step: **147 s -> 11.9 s** process-cold
build+first-step once the cache is warm (min_compile_time=0 so the eager
mini-programs cache too; 278 entries, 13 MB).

The reference has no compile step at all (PyTorch 1.4 eager), so this is
TPU-native operational surface with no upstream counterpart: it is what
makes server restarts (``eval/serve.py`` hot paths), training resumes and
repeated CLI runs production-fast.

Control via ``FMRI_TPU_COMPILE_CACHE``:
  * unset           -> cache at ``~/.cache/fmri_tpu/xla`` (default ON)
  * ``0``/``false`` -> disabled
  * any other value -> used as the cache directory
"""

from __future__ import annotations

import os
from typing import Optional


def enable(path: Optional[str] = None) -> Optional[str]:
    """Turn on the persistent compilation cache (call before first compile).

    Returns the cache directory, or None if disabled.  Safe to call more
    than once; never raises (a read-only filesystem just disables caching).
    """
    env = os.environ.get("FMRI_TPU_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "false", "no", "off"):
        return None
    try:
        import jax

        # Default-on only for non-CPU backends: XLA:CPU cache entries are
        # AOT machine code whose feature flags are host-specific (reloading
        # logs SIGILL warnings on feature mismatch), and CPU compiles are
        # fast anyway.  An explicit env value or path still opts in on CPU.
        # Callers (the CLIs) invoke this after their platform override, so
        # the resolved default backend is the real decision input.
        if env is None and path is None and jax.default_backend() == "cpu":
            return None
        cache_dir = path or env or os.path.join(
            os.path.expanduser("~"), ".cache", "fmri_tpu", "xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache EVERYTHING: the eager-init warmup is hundreds of sub-second
        # programs whose cost is the compile round trip, not compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
