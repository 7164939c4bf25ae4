"""Run-artifact utilities: CSV evolution, schedules, early stopping, grids."""

import math
import os

import numpy as np
import pytest

from fmri_tpu.configs import TINY
from fmri_tpu.train.trainer import EarlyStopping, GameSchedules
from fmri_tpu.utils.runlog import ResultsCSV, make_grid


def test_results_csv_roundtrip_and_column_evolution(tmp_path):
    p = str(tmp_path / "results.csv")
    r = ResultsCSV(p)
    r.append({"epoch": 0, "loss": 1.0})
    r.append({"epoch": 1, "loss": 0.5})
    # reload (resume path)
    r2 = ResultsCSV(p)
    assert r2.last_epoch == 1
    assert r2.column("loss") == [1.0, 0.5]
    # a newer version adds a column: file is rewritten with the union
    r2.append({"epoch": 2, "loss": 0.25, "valid_PCC": 0.9})
    r3 = ResultsCSV(p)
    assert "valid_PCC" in r3.fields
    assert math.isnan(r3.rows[0].get("valid_PCC", float("nan")))
    assert r3.rows[-1]["valid_PCC"] == 0.9


def test_game_schedules_cap_rules():
    """margin/eq decay with the reference's cap rules
    (train_vgan_stage1.py:451-458)."""
    import dataclasses

    cfg = TINY.replace(train=dataclasses.replace(
        TINY.train, margin=0.5, equilibrium=0.6, decay_margin=1.5,
        decay_equilibrium=1.0, lambda_mse=0.4, decay_mse=2.0))
    s = GameSchedules(cfg)
    s.epoch_end()
    # margin 0.75 > equilibrium 0.6 -> equilibrium snaps up to margin
    assert s.margin == 0.75 and s.equilibrium == 0.75
    # lambda doubles then caps at 1
    assert s.lambda_mse == 0.8
    s.epoch_end()
    assert s.lambda_mse == 1.0


def test_early_stopping_patience():
    es = EarlyStopping(patience=2, mode="max")
    assert not es.update(0.1)
    assert not es.update(0.2)   # improvement
    assert not es.update(0.15)  # bad 1
    assert not es.update(0.1)   # bad 2
    assert es.update(0.05)      # bad 3 > patience -> stop
    # patience=0 disables (gan_config.py:15) except the NaN stop
    es0 = EarlyStopping(patience=0)
    for v in (0.5, 0.1, 0.01):
        assert not es0.update(v)
    assert es0.update(float("nan"))


def test_make_grid_tiling():
    imgs = np.random.default_rng(0).uniform(0, 1, (5, 4, 4, 3)).astype(np.float32)
    grid = make_grid(imgs, nrow=3, pad=1)
    # 2 rows x 3 cols of 4px tiles with 1px padding
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 3)


class TestProfileReport:
    """fmri_tpu.utils.profile_report: xplane parsing without TensorBoard."""

    def _write_trace(self, tmp_path):
        import os
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        xs = xplane_pb2.XSpace()
        p = xs.planes.add(name="/device:TPU:0")
        p.event_metadata[1].id = 1
        p.event_metadata[1].name = "%fusion.1 = f32[8,8] fusion(...)"
        p.event_metadata[2].id = 2
        p.event_metadata[2].name = "%convert_reduce_fusion.3 = (f32[4]) fusion(...)"
        p.event_metadata[3].id = 3
        p.event_metadata[3].name = "jit_train_step(123)"
        mods = p.lines.add(name="XLA Modules")
        ops = p.lines.add(name="XLA Ops")
        for step in range(2):  # 2 steps
            ev = mods.events.add(metadata_id=3)
            ev.duration_ps = int(5e6)
            e1 = ops.events.add(metadata_id=1)
            e1.duration_ps = int(3e6)  # 3 us
            e2 = ops.events.add(metadata_id=2)
            e2.duration_ps = int(1e6)  # 1 us
        d = tmp_path / "trace" / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        path = d / "host.xplane.pb"
        path.write_bytes(xs.SerializeToString())
        return str(tmp_path / "trace"), str(path)

    def test_summarize_and_cli(self, tmp_path, capsys):
        from fmri_tpu.utils.profile_report import (
            find_xplane, format_report, main, summarize,
        )

        trace_dir, pb_path = self._write_trace(tmp_path)
        assert find_xplane(trace_dir) == pb_path

        s = summarize(pb_path)
        plane = s["/device:TPU:0"]
        assert plane["steps"] == 2
        assert plane["total_us"] == pytest.approx(8.0)  # (3+1)us x 2 steps
        assert plane["by_kind"]["fusion"] == pytest.approx(6.0)
        assert plane["by_kind"]["convert_reduce_fusion"] == pytest.approx(2.0)

        report = format_report(s)
        assert "2 steps" in report and "fusion" in report

        assert main([trace_dir, "--top", "5"]) == 0
        out = capsys.readouterr().out
        assert "/device:TPU:0" in out and "75.0%" in out
