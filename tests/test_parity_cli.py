"""One-command parity harness tests (fmri_tpu/eval/parity.py).

Runs the full chain — reference-layout .pth -> torch_import conversion ->
inference/evaluate -> side-by-side report — on synthetic fixtures, so the
real-data invocation (docs/parity_runbook.md) is a data-path change only.
"""

import json
import os

import numpy as np
import pytest

from fmri_tpu.configs import get_config


@pytest.fixture(scope="module")
def tiny_artifacts(tmp_path_factory):
    """A tiny stage-2 framework checkpoint AND the same weights exported as
    a reference-layout ``.pth`` (the format ``--ref-ckpt`` consumes)."""
    torch = pytest.importorskip("torch")

    from fmri_tpu.checkpoints.store import save_checkpoint
    from fmri_tpu.checkpoints.torch_import import export_state_dict
    from fmri_tpu.train import stages

    cfg = get_config("tiny")
    root = tmp_path_factory.mktemp("parity")
    d1 = str(root / "s1")
    state1, _, _ = stages.vgan_stage1(cfg, steps_per_epoch=1, donate=False)
    save_checkpoint(d1, 0, state1)
    d2 = str(root / "s2")
    state2, _, _ = stages.vgan_stage2(cfg, d1, steps_per_epoch=1, donate=False)
    save_checkpoint(d2, 0, state2)

    groups = {name: {"params": state2.params[name],
                     "batch_stats": state2.batch_stats.get(name, {})}
              for name in state2.params}
    sd = export_state_dict(groups, cfg, kind="vae-gan-cognitive")
    pth = str(root / "reference_stage2.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, pth)
    return cfg, d2, pth


def test_parity_cli_end_to_end(tiny_artifacts, tmp_path):
    """Both rows (converted reference .pth + framework ckpt) produce the
    BASELINE.md table-2 metric battery; since the .pth IS the framework
    state round-tripped, the two rows must agree to float tolerance —
    the conversion leg of the harness is thereby self-validating."""
    from fmri_tpu.eval import parity

    cfg, d2, pth = tiny_artifacts
    out = str(tmp_path / "report")
    rc = parity.main([
        "--family", "vgan", "--stage", "2", "--preset", "tiny",
        "--ref-ckpt", pth, "--ckpt", d2,
        "--dataset", "synthetic", "--synthetic-n", "32",
        "--batch-size", "8", "--no-is", "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "parity.json")) as f:
        report = json.load(f)
    assert len(report["rows"]) == 2
    ref_row, fw_row = report["rows"]
    for row in (ref_row, fw_row):
        for key in ("pcc", "ssim", "mse", "pcc_2way", "pcc_5way",
                    "pcc_10way", "ssim_2way", "ssim_5way", "ssim_10way"):
            assert np.isfinite(row[key]), (row["checkpoint"], key)
    for key in ("pcc", "ssim", "mse"):
        np.testing.assert_allclose(ref_row[key], fw_row[key], rtol=1e-4,
                                   err_msg=key)
    md = open(os.path.join(out, "parity.md")).read()
    assert "pcc_10way" in md and md.count("\n") >= 4
    # per-row artifacts exist (summary/objective csv from the inference leg)
    assert os.path.exists(os.path.join(out, "ref", "objective.csv"))
    assert os.path.exists(os.path.join(out, "framework", "summary.json"))


def test_parity_cli_requires_a_checkpoint(tmp_path):
    from fmri_tpu.eval import parity

    assert parity.main(["--output", str(tmp_path / "x")]) == 2
