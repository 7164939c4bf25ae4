"""Persistent XLA compilation cache (``fmri_tpu.utils.compile_cache``).

On the tunneled TPU a process-cold start pays 20-40 s per program compile
plus a minutes-long eager-init warmup; the cache removes both (measured
147 s -> 11.9 s on the WAE stage-1 step).  Runs in subprocesses so the
jax.config mutations cannot leak into this test process.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROG = """
import jax
jax.config.update("jax_platforms", "cpu")
from fmri_tpu.utils.compile_cache import enable
d = enable()
print("DIR=" + repr(d))
import jax.numpy as jnp
print(float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64)))))
"""


def _run(env_value, tmp_path):
    env = dict(os.environ, FMRI_TPU_PLATFORM="cpu")
    env.pop("FMRI_TPU_COMPILE_CACHE", None)
    if env_value is not None:
        env["FMRI_TPU_COMPILE_CACHE"] = env_value
    # HOME fallback must not write to the real home dir during tests
    env["HOME"] = str(tmp_path)
    out = subprocess.run([sys.executable, "-c", _PROG], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("DIR=")][0]
    return eval(line[4:])  # repr of str or None


def test_cache_dir_populated(tmp_path):
    cache = tmp_path / "xla_cache"
    d = _run(str(cache), tmp_path)
    assert d == str(cache)
    entries = list(cache.iterdir())
    assert entries, "compile cache wrote no entries after a jit compile"


def test_cache_disabled(tmp_path):
    assert _run("0", tmp_path) is None
    assert _run("off", tmp_path) is None


def test_cache_default_off_on_cpu(tmp_path):
    """On a resolved CPU backend with no explicit opt-in, the cache stays
    off (XLA:CPU AOT entries are host-feature-specific; the win is the
    tunneled TPU's server-side compiles).  The guard keys on
    ``jax.default_backend()``, not env vars, so it holds on plain CPU-only
    installs too."""
    assert _run(None, tmp_path) is None
