"""Smoke-test every bench-suite builder on the tiny preset (CPU).

``bench.py`` is the driver contract: its failures otherwise surface only at
round end on the real TPU.  Each SUITE builder is exercised end-to-end
(state assembly, step signature, metric key, timing sync) at batch 4 on the
``tiny`` config — signature drift in the step factories breaks here first.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _small_batch(monkeypatch):
    # _time_steps' warmup/iters defaults bound at import (3 + 20 = 23 steps);
    # BATCH, the SYNC_* constants and the key count are read at call time,
    # so patching them keeps the builder internals consistent while keeping
    # the smoke cheap (the sub-ms rows run 105 dispatches on the TPU).
    monkeypatch.setattr(bench, "BATCH", 4)
    monkeypatch.setattr(bench, "SYNC_WARMUP", 1)
    monkeypatch.setattr(bench, "SYNC_ITERS", 3)


@pytest.mark.parametrize("name,fn", [(n, f) for n, f, _preset in bench.SUITE])
def test_suite_builder_runs(name, fn):
    v = fn("tiny")
    assert v > 0, f"{name} reported non-positive throughput: {v}"


class TestWarmTouch:
    """The pre-measurement device warm-touch (bench._warm_tpu): a stalled
    first TPU contact is retried from a killable child process."""

    def test_retries_after_stall_then_stops_on_success(self, monkeypatch):
        import subprocess

        monkeypatch.delenv("FMRI_TPU_PLATFORM", raising=False)
        monkeypatch.delenv("FMRI_TPU_BENCH_NO_WARM", raising=False)
        calls = []

        def fake_run(cmd, timeout, **kw):
            calls.append(timeout)
            if len(calls) == 1:
                raise subprocess.TimeoutExpired(cmd, timeout)
            return None

        # _warm_tpu imports subprocess locally; patching the module object's
        # attribute covers it
        monkeypatch.setattr(subprocess, "run", fake_run)
        bench._warm_tpu(attempts=3, timeout_s=7)
        assert calls == [7, 7]  # one stall, one success, no third attempt

    def test_skips_on_cpu_platform_and_optout(self, monkeypatch):
        import subprocess as sp

        def boom(*a, **kw):  # pragma: no cover - must not be reached
            raise AssertionError("warm-touch ran despite skip condition")

        monkeypatch.setattr(sp, "run", boom)
        monkeypatch.setenv("FMRI_TPU_PLATFORM", "cpu")
        bench._warm_tpu()
        monkeypatch.delenv("FMRI_TPU_PLATFORM")
        monkeypatch.setenv("FMRI_TPU_BENCH_NO_WARM", "1")
        bench._warm_tpu()

    def test_gives_up_after_attempts_without_raising(self, monkeypatch):
        import subprocess as sp

        calls = []

        def always_stall(cmd, timeout, **kw):
            calls.append(timeout)
            raise sp.TimeoutExpired(cmd, timeout)

        monkeypatch.setattr(sp, "run", always_stall)
        monkeypatch.delenv("FMRI_TPU_PLATFORM", raising=False)
        monkeypatch.delenv("FMRI_TPU_BENCH_NO_WARM", raising=False)
        bench._warm_tpu(attempts=2, timeout_s=3)  # non-fatal by contract
        assert calls == [3, 3]
