"""CLI + evaluation subsystem tests.

Exercises the training CLI end-to-end (synthetic smoke, the reference's MNIST
analogue), the inference CLI over the produced checkpoint, the evaluation
helpers, and the user-study scorer.
"""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["FMRI_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    return env


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_run"))
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.train.run", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "synthetic",
         "--epochs", "1", "-o", out],
        capture_output=True, text=True, env=_env(), timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    runs = []
    for root, dirs, files in os.walk(out):
        if "results.csv" in files:
            runs.append(root)
    assert len(runs) == 1
    return runs[0]


def test_train_cli_artifacts(trained_run):
    assert os.path.exists(os.path.join(trained_run, "config.json"))
    assert os.path.exists(os.path.join(trained_run, "results.csv"))
    assert os.path.isdir(os.path.join(trained_run, "checkpoints"))
    with open(os.path.join(trained_run, "results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert float(rows[0]["loss_encoder"]) == float(rows[0]["loss_encoder"])  # not NaN


def test_train_cli_num_voxels_override(trained_run, tmp_path):
    """--num-voxels: a stage-2 cognitive run over a voxel count no preset
    names (the reference sizes the encoder from the data,
    ``train_vgan_stage2.py:182``).  The stage-1 checkpoint grafts unchanged
    — decoder/discriminator/teacher shapes are voxel-independent."""
    out = str(tmp_path / "nv")
    ckpt = os.path.join(trained_run, "checkpoints")
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.train.run", "--family", "vgan",
         "--stage", "2", "--preset", "tiny", "--dataset", "synthetic",
         "--num-voxels", "96", "--epochs", "1", "--prev-ckpt", ckpt,
         "-o", out],
        capture_output=True, text=True, env=_env(), timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    cfgs = [os.path.join(root, "config.json")
            for root, _dirs, files in os.walk(out) if "config.json" in files]
    assert len(cfgs) == 1
    with open(cfgs[0]) as f:
        dumped = json.load(f)
    assert dumped["model"]["num_voxels"] == 96
    assert dumped["data"]["num_voxels"] == 96


def test_inference_cli(trained_run, tmp_path):
    out = str(tmp_path / "inf")
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.eval.inference", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "synthetic",
         "--ckpt", os.path.join(trained_run, "checkpoints"),
         "--no-is", "--save-images", "--resize", "32",
         "--max-batches", "1", "-o", out],
        capture_output=True, text=True, env=_env(), timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert {"pcc", "ssim", "mse", "objective"} <= set(summary)
    assert summary["objective"]["top"] == [2, 5, 10]
    assert os.path.exists(os.path.join(out, "objective.csv"))
    assert os.path.exists(os.path.join(out, "objective.png"))
    imgs = os.listdir(os.path.join(out, "images"))
    assert len(imgs) == summary["num_images"]


def test_quality_and_objective_helpers():
    from fmri_tpu.eval import objective_scores, quality_metrics

    rng = np.random.default_rng(0)
    targets = rng.uniform(0, 1, (12, 16, 16, 3)).astype(np.float32)
    # near-perfect reconstructions must win every n-way comparison
    recons = np.clip(targets + rng.normal(0, 0.01, targets.shape), 0, 1).astype(
        np.float32)
    m = quality_metrics(recons, targets, with_is=False)
    assert m["pcc"] > 0.95 and m["ssim"] > 0.9 and m["mse"] < 1e-3
    # proxy Inception Score path (train_utils.py:819-881 machinery)
    m_is = quality_metrics(recons[:8], targets[:8], with_is=True)
    assert m_is["is_proxy"] == 1.0
    assert np.isfinite(m_is["is_mean"]) and m_is["is_mean"] >= 1.0 - 1e-3
    s = objective_scores(recons, targets, tops=(2, 5))
    assert s["pcc"] == [1.0, 1.0]
    assert s["ssim"] == [1.0, 1.0]


def test_user_study_scorer(tmp_path):
    from fmri_tpu.eval.user_study import save_preference_chart, score_all, score_task

    # synthetic survey: 4 participants, 5 questions, key = [1,2,1,2,1]
    key = [1, 2, 1, 2, 1]
    fields = ["ts", "id"] + [f"q{i}" for i in range(5)]
    rows = []
    for p in range(4):
        row = {"ts": "t", "id": str(p)}
        for i in range(5):
            # participants 0-2 answer correctly, participant 3 always Option 1
            correct = f"Option {key[i]}"
            row[f"q{i}"] = correct if p < 3 else "Option 1"
        rows.append(row)
    path = tmp_path / "results.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)

    tasks = {"taskX": ((2, 7), key)}
    scores = score_all(str(path), tasks=tasks)
    # participant 3 gets the 3 'Option 1' questions right: (15 + 3) / 20
    assert abs(scores["taskX"] - 18 / 20) < 1e-9

    chart = tmp_path / "chart.png"
    save_preference_chart(str(chart))
    assert chart.exists()


def test_cli_bold_data_path(tmp_path):
    """The training CLI's --dataset bold loader: reference-format per-subject
    pickles -> packed arrays -> split (no subprocess; drives _load_pairs)."""
    import pickle
    import types

    from PIL import Image

    from fmri_tpu.configs import TINY
    from fmri_tpu.train.run import _load_pairs

    rng = np.random.default_rng(0)
    imgs = tmp_path / "stimuli"
    imgs.mkdir()
    for i in range(12):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(imgs / f"s{i}.png")
    root = tmp_path / "bold_roi"
    for sub, n0 in (("CSI1", 7), ("CSI2", 5)):
        d = root / sub
        d.mkdir(parents=True)
        with open(d / f"{sub}_roi_pad.pickle", "wb") as f:
            pickle.dump(rng.normal(size=(n0, TINY.model.num_voxels)), f)
        with open(d / f"{sub}_stimuli_paths.pickle", "wb") as f:
            pickle.dump([str(imgs / f"s{i}.png") for i in range(n0)], f)

    args = types.SimpleNamespace(dataset="bold", input=str(root),
                                 cache_dir=None, synthetic_n=None)
    cfg = TINY
    train, valid = _load_pairs(args, cfg)
    assert train["fmri"].shape[1] == cfg.model.num_voxels
    assert train["image"].shape[1:] == (cfg.model.image_size,
                                        cfg.model.image_size, 3)
    # 12 records, split 0.2 seed 12345 -> 9/3 (sklearn ceil)
    assert len(train["fmri"]) + len(valid["fmri"]) == 12
    assert len(valid["fmri"]) == 3


def test_train_cli_mesh_data_parallel(tmp_path):
    """--mesh data=4: the full training CLI under SPMD on 4 virtual devices."""
    out = str(tmp_path / "mesh_run")
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.train.run", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "synthetic",
         "--epochs", "1", "--mesh", "data=4", "-o", out],
        capture_output=True, text=True, env=_env(), timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    found = [root for root, _, files in os.walk(out) if "results.csv" in files]
    assert len(found) == 1
    with open(os.path.join(found[0], "results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert np.isfinite(float(rows[0]["loss_encoder"]))


def test_train_cli_resume(trained_run):
    """--resume-dir continues from the stored checkpoint with the right
    epoch offset (reference resume contract, train_vgan_stage1.py:239-247)."""
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.train.run", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "synthetic",
         "--epochs", "2", "--resume-dir", trained_run],
        capture_output=True, text=True, env=_env(), timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(trained_run, "results.csv")) as f:
        rows = list(csv.DictReader(f))
    # original run wrote epoch 0; the resumed run appends epoch 1
    assert [int(float(x["epoch"])) for x in rows] == [0, 1]


def test_train_cli_evaluate_only(trained_run):
    """--evaluate: metrics-only pass over the validation set (the reference's
    evaluate=True early-exit, train_vgan_stage1.py:247-257)."""
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.train.run", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "synthetic",
         "--resume-dir", trained_run, "--evaluate"],
        capture_output=True, text=True, env=_env(), timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    # stdout ends with a flat metrics JSON object
    payload = json.loads(r.stdout[r.stdout.rindex("{"):])
    assert "valid_PCC" in payload, r.stdout[-500:]


def test_cli_mnist69_path(tmp_path):
    """--dataset mnist69: .mat rows [784 pixels | voxels] -> 80/20 split
    (train_vgan_stage2.py:184-204)."""
    import types

    import scipy.io as sio

    from fmri_tpu.configs import TINY
    from fmri_tpu.train.run import _load_pairs

    rng = np.random.default_rng(3)
    rows = np.concatenate([
        rng.integers(0, 255, size=(40, 784)).astype(np.float64),
        rng.normal(size=(40, TINY.model.num_voxels)),
    ], axis=1)
    mat = str(tmp_path / "69dataset.mat")
    sio.savemat(mat, {"D": rows})
    args = types.SimpleNamespace(dataset="mnist69", input=mat,
                                 cache_dir=None, synthetic_n=None)
    train, valid = _load_pairs(args, TINY)
    assert len(train["fmri"]) + len(valid["fmri"]) == 40
    assert train["image"].shape[1:] == (TINY.model.image_size,
                                        TINY.model.image_size, 3)


def test_cli_streaming_packed_dir(tmp_path):
    """pack-stream -> train from the mmap dir: uint8 batches stream from disk
    and are dequantized on device (fmri_tpu.data.packed + train_augment)."""
    from fmri_tpu.configs import TINY
    from fmri_tpu.data.synthetic import synthetic_images

    imgs, _ = synthetic_images(48, TINY.model.image_size, seed=0)
    npz = str(tmp_path / "imgs.npz")
    np.savez(npz, images=(imgs * 255.0 + 0.5).astype(np.uint8))

    packed = str(tmp_path / "packed")
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.data.prepare", "pack-stream",
         "-i", npz, "-o", packed],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(packed, "image.npy"))

    out = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.train.run", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "coco",
         "--input", packed, "--epochs", "1", "-o", out],
        capture_output=True, text=True, env=_env(), timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    found = [root for root, _, files in os.walk(out) if "results.csv" in files]
    assert len(found) == 1
    with open(os.path.join(found[0], "results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and np.isfinite(float(rows[0]["loss_encoder"]))


def test_inference_exact_is_wiring(trained_run, tmp_path):
    """VERDICT r2 #9: with ``FMRI_TPU_INCEPTION_NPZ`` set (random-weight
    fixture — same layout the real torchvision export uses), the CLI ->
    evaluate -> exact Inception-v3 path engages and the summary's
    ``is_proxy`` label flips to 0.  Proves the plumbing before real weights
    ever land."""
    from test_inception_v3 import make_state_dict

    npz = str(tmp_path / "inception_v3.npz")
    np.savez(npz, **make_state_dict(np.random.default_rng(0)))
    out = str(tmp_path / "inf_is")
    env = _env()
    env["FMRI_TPU_INCEPTION_NPZ"] = npz
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.eval.inference", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "synthetic",
         "--ckpt", os.path.join(trained_run, "checkpoints"),
         "--batch-size", "4", "--max-batches", "1", "-o", out],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["is_proxy"] == 0.0
    assert np.isfinite(summary["is_mean"]) and summary["is_mean"] > 0
