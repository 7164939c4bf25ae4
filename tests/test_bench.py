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
