"""Data subsystem tests: NIfTI reader, ETL, transforms, datasets, pipeline.

The reference ships no tests (SURVEY.md §4); oracles here are scipy / sklearn /
hand-built synthetic fixtures reproducing the reference's file layouts.
"""

import os
import pickle

import numpy as np
import pytest

from fmri_tpu.data import (
    Batches, BoldRoiDataset, CocoImages, Mnist69, aggregate_bold_sessions,
    concatenate_bold_data, device_iterator, extract_roi, find_stimuli_path,
    max_roi_length, nifti, split_dataset, split_subject_data,
    train_test_stimuli_split, zscore,
)
from fmri_tpu.data.transforms import (
    center_crop, load_stimulus, normalize, random_flip_batch,
    random_shift_batch, resize_batch,
)

import jax
import jax.numpy as jnp


# ----------------------------- fixtures -----------------------------


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture
def image_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        _write_png(d / f"img_{i:03d}.png", arr)
    # one greyscale image to exercise GreyToColor
    _write_png(d / "grey.png", rng.integers(0, 255, (40, 50), dtype=np.uint8))
    return str(d)


@pytest.fixture
def roi_dir(tmp_path):
    """Synthetic figshare-style ROI layout: 2 subjects x 2 regions."""
    import h5py

    rng = np.random.default_rng(1)
    shapes = {"CSI1": {"LHA": 5, "RHB": 7}, "CSI2": {"LHA": 8, "RHB": 4}}
    for sub, regions in shapes.items():
        d = tmp_path / "rois" / sub / "h5"
        d.mkdir(parents=True)
        with h5py.File(d / f"{sub}_ROIs_TR34.h5", "w") as f:
            for region, nvox in regions.items():
                f[region] = rng.normal(size=(10, nvox))
    # stim lists
    sl = tmp_path / "rois" / "stim_lists"
    sl.mkdir()
    for i, sub in enumerate(("CSI01", "CSI02")):
        names = [f"img_{j:03d}.png" for j in range(10)]
        names[0] = "rep_" + names[0]
        (sl / f"{sub}_stim_lists.txt").write_text("\n".join(names) + "\n")
    return str(tmp_path / "rois")


# ----------------------------- nifti -----------------------------


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(4, 5, 6, 7)).astype(np.float32)
    for name in ("a.nii", "b.nii.gz"):
        p = str(tmp_path / name)
        nifti.save(p, vol)
        img = nifti.load(p)
        assert img.shape == vol.shape
        np.testing.assert_allclose(img.get_fdata(np.float32), vol, rtol=1e-6)
        # nibabel<3 alias used by the reference
        np.testing.assert_allclose(img.get_data(np.float32), vol, rtol=1e-6)


def test_nifti_int_dtype(tmp_path):
    vol = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "i.nii.gz")
    nifti.save(p, vol)
    np.testing.assert_array_equal(nifti.load(p).get_fdata(), vol)


# ----------------------------- etl -----------------------------


def test_extract_roi_pads_to_cross_subject_max(roi_dir, tmp_path):
    subs = ("CSI1", "CSI2")
    maxima = max_roi_length(roi_dir, subs)
    assert maxima == {"LHA": 8, "RHB": 7}
    out = extract_roi(roi_dir, str(tmp_path / "out"), subs, save=True)
    for sub in subs:
        assert out[sub].shape == (10, 15)  # 8 + 7 voxels
    # CSI1 LHA had 5 voxels -> columns 5..8 zero-padded
    assert np.all(out["CSI1"][:, 5:8] == 0.0)
    # reference-compatible pickle written
    with open(tmp_path / "out" / "CSI1" / "CSI1_roi_pad.pickle", "rb") as f:
        np.testing.assert_array_equal(pickle.load(f), out["CSI1"])


def test_zscore_matches_sklearn():
    from sklearn import preprocessing

    rng = np.random.default_rng(3)
    x = rng.normal(2.0, 3.0, size=(50, 7))
    np.testing.assert_allclose(zscore(x), preprocessing.scale(x), atol=1e-6)


def test_stimuli_split_deterministic(roi_dir):
    f = os.path.join(roi_dir, "stim_lists", "CSI01_stim_lists.txt")
    tr1, te1 = train_test_stimuli_split(f)
    tr2, te2 = train_test_stimuli_split(f)
    assert tr1 == tr2 and te1 == te2
    assert len(tr1) == 9 and len(te1) == 1  # 10 unique, ratio 0.1
    # rep_ prefix stripped -> still 10 unique names
    assert not any(n.startswith("rep_") for n in tr1 + te1)


def test_bold_aggregation_and_stimuli_paths(tmp_path, roi_dir):
    import csv

    # synthetic ds001499 layout: 1 subject, 1 session, 1 run
    func = tmp_path / "sessions" / "sub-CSI1" / "ses-01" / "func"
    func.mkdir(parents=True)
    bold = func / "sub-CSI1_ses-01_task-5000scenes_run-01_bold.nii.gz"
    nifti.save(str(bold), np.zeros((2, 2, 2, 15), np.float32))
    with open(func / "sub-CSI1_ses-01_task-5000scenes_run-01_events.tsv", "w") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["onset", "ImgName", "ImgType"])
        w.writerow([6.0, "img_000.png", "coco"])
        w.writerow([16.0, "img_001.png", "imagenet"])
    idx = aggregate_bold_sessions(str(tmp_path / "sessions"), "/stimuli")
    assert idx["img_name"] == ["img_000.png", "img_001.png"]
    assert idx["trial"] == [1, 2]
    assert idx["stimuli_path"][0] == "/stimuli/COCO/img_000.png"
    assert idx["stimuli_path"][1] == "/stimuli/ImageNet/img_001.png"

    paths = find_stimuli_path(idx, os.path.join(roi_dir, "stim_lists"))
    # stim list has img_000..img_009 (img_000 as rep_); only 2 are in the index
    assert paths["CSI1"] == ["/stimuli/COCO/img_000.png",
                             "/stimuli/ImageNet/img_001.png"]


def test_concatenate_bold_data(tmp_path, image_dir):
    rng = np.random.default_rng(4)
    for sub, n in (("CSI1", 6), ("CSI2", 4)):
        d = tmp_path / "bold_roi" / sub
        d.mkdir(parents=True)
        with open(d / f"{sub}_roi_pad.pickle", "wb") as f:
            pickle.dump(rng.normal(size=(n, 5)), f)
        with open(d / f"{sub}_stimuli_paths.pickle", "wb") as f:
            pickle.dump([os.path.join(image_dir, f"img_{i:03d}.png")
                         for i in range(n)], f)
    recs = concatenate_bold_data(str(tmp_path / "bold_roi") + os.sep,
                                 subjects=("CSI1", "CSI2"))
    assert len(recs) == 10
    assert recs[0]["fmri"].shape == (5,)
    # per-subject z-score: each subject block has ~zero column means
    block = np.stack([r["fmri"] for r in recs[:6]])
    np.testing.assert_allclose(block.mean(axis=0), 0.0, atol=1e-5)
    tr, va = split_dataset(recs)
    assert len(tr) == 8 and len(va) == 2
    tr2, va2 = split_dataset(recs)
    assert [r["image"] for r in tr] == [r["image"] for r in tr2]


# ----------------------------- transforms -----------------------------


def test_center_crop_matches_reference_window():
    img = np.arange(10 * 12 * 3, dtype=np.float32).reshape(10, 12, 3)
    out = center_crop(img, 6)
    # reference: start = dim//2 - crop//2 (data_loader.py:158-159)
    np.testing.assert_array_equal(out, img[2:8, 3:9])


def test_random_shift_matches_scipy():
    from scipy.ndimage import shift as sp_shift

    rng = np.random.default_rng(5)
    img = rng.normal(size=(9, 9, 3)).astype(np.float32)
    key = jax.random.key(0)
    shifted = np.asarray(random_shift_batch(key, jnp.asarray(img)[None], 3)[0])
    # recover the shift that was applied and compare against scipy's oracle
    shifts = jax.random.randint(key, (1, 2), -3, 4)
    dy, dx = int(shifts[0, 0]), int(shifts[0, 1])
    oracle = sp_shift(img, [dy, dx, 0], prefilter=False, order=0, mode="nearest")
    np.testing.assert_allclose(shifted, oracle, atol=1e-6)


def test_normalize_and_flip():
    x = jnp.ones((2, 4, 4, 3)) * 0.5
    y = normalize(x, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-7)
    # flip is an involution and preserves content
    x = jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))
    flipped = random_flip_batch(jax.random.key(2), x)
    for i in range(4):
        xi, fi = np.asarray(x[i]), np.asarray(flipped[i])
        assert np.allclose(fi, xi) or np.allclose(fi, xi[:, ::-1])


def test_resize_batch_shape():
    x = jnp.zeros((2, 64, 64, 3))
    assert resize_batch(x, 200).shape == (2, 200, 200, 3)


# ----------------------------- datasets -----------------------------


def test_coco_images_pack_and_cache(image_dir, tmp_path):
    ds = CocoImages(image_dir, crop=32, size=16)
    assert len(ds) == 7
    img = ds.get(0)
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    cache = str(tmp_path / "cache" / "coco.npz")
    packed = ds.as_array(cache=cache)
    assert packed.shape == (7, 16, 16, 3)
    again = ds.as_array(cache=cache)
    np.testing.assert_allclose(packed, again, atol=1 / 255.0 + 1e-6)


def test_bold_roi_dataset_and_split(image_dir, tmp_path):
    rng = np.random.default_rng(6)
    recs = [{"fmri": rng.normal(size=8).astype(np.float32),
             "image": os.path.join(image_dir, f"img_{i:03d}.png")}
            for i in range(6)]
    ds = BoldRoiDataset(recs, crop=32, size=16)
    s = ds.get(0)
    assert s["fmri"].shape == (8,) and s["image"].shape == (16, 16, 3)
    arrays = ds.as_arrays()
    assert arrays["fmri"].shape == (6, 8)
    assert arrays["image"].shape == (6, 16, 16, 3)

    split_file = tmp_path / "split.pickle"
    with open(split_file, "wb") as f:
        pickle.dump([f"img_{i:03d}.png" for i in range(3)], f)
    sub = split_subject_data(recs, str(split_file))
    assert len(sub) == 3


def test_bold_roi_root_path_rebase_is_pure(tmp_path, image_dir):
    # record points at a stale prefix; root_path rebases without mutating it
    stale = "/old/prefix/BOLD5000/stimuli/x.png"
    recs = [{"fmri": np.zeros(4, np.float32), "image": stale}]
    ds = BoldRoiDataset(recs, root_path="/new/root/")
    from fmri_tpu.data.datasets import _resolve_root

    assert _resolve_root(stale, "/new/root/") == "/new/root/BOLD5000/stimuli/x.png"
    assert recs[0]["image"] == stale  # no mutation (data_loader.py:245-247 bug)


def test_mnist69(tmp_path):
    import scipy.io as sio

    rng = np.random.default_rng(7)
    rows = np.concatenate([
        rng.integers(0, 255, size=(5, 784)).astype(np.float64),
        rng.normal(size=(5, 100)),
    ], axis=1)
    mat = str(tmp_path / "69dataset.mat")
    sio.savemat(mat, {"D": rows})
    ds = Mnist69(mat, size=16)
    assert len(ds) == 5 and ds.num_voxels == 100
    s = ds.get(0)
    assert s["fmri"].shape == (100,) and s["image"].shape == (16, 16, 3)
    # grey replication: all three channels equal
    np.testing.assert_allclose(s["image"][..., 0], s["image"][..., 1])


# ----------------------------- pipeline -----------------------------


def test_batches_deterministic_shuffle():
    data = {"x": np.arange(20), "y": np.arange(20) * 2}
    b1 = Batches(data, 8, shuffle=True, seed=3)
    b2 = Batches(data, 8, shuffle=True, seed=3)
    e1, e2 = list(b1), list(b2)
    assert len(e1) == 2  # drop_last
    for a, b in zip(e1, e2):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["x"] * 2, a["y"])
    # next epoch reshuffles differently
    e3 = list(b1)
    assert not all(np.array_equal(a["x"], b["x"]) for a, b in zip(e1, e3))


def test_device_iterator_prefetch():
    data = np.arange(32, dtype=np.float32).reshape(8, 4)
    batches = Batches(data, 4)
    out = list(device_iterator(iter(batches), prefetch=2))
    assert len(out) == 2
    assert isinstance(out[0], jax.Array)
    np.testing.assert_array_equal(np.concatenate([np.asarray(o) for o in out]), data)


def test_device_iterator_with_mesh():
    from fmri_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4)
    data = {"fmri": np.zeros((8, 16), np.float32),
            "image": np.zeros((8, 4, 4, 3), np.float32)}
    out = list(device_iterator(iter(Batches(data, 8)), mesh=mesh, voxel_tp=True))
    assert len(out) == 1
    assert out[0]["image"].shape == (8, 4, 4, 3)


def test_prepare_cli_end_to_end(tmp_path, roi_dir, image_dir):
    """The ETL CLI chain on synthetic fixtures: extract-roi -> stimuli-paths
    -> split-stimuli -> pack (reference ETL mains, roi_extraction.py /
    data_loader.py __main__)."""
    import csv as _csv
    import json
    import io
    from contextlib import redirect_stdout

    from fmri_tpu.data import prepare

    # fake bold index whose stimuli live in a 10-image dir
    img10 = tmp_path / "imgs10"
    img10.mkdir()
    rng = np.random.default_rng(9)
    for i in range(10):
        _write_png(img10 / f"img_{i:03d}.png",
                   rng.integers(0, 255, (40, 50, 3), dtype=np.uint8))
    idx = {"img_name": [f"img_{i:03d}.png" for i in range(10)],
           "stimuli_path": [os.path.join(str(img10), f"img_{i:03d}.png")
                            for i in range(10)]}
    bold_pickle = tmp_path / "bold5000.pickle"
    with open(bold_pickle, "wb") as f:
        pickle.dump(idx, f)

    out_roi = str(tmp_path / "bold_roi")
    buf = io.StringIO()
    with redirect_stdout(buf):
        prepare.main(["extract-roi", "-i", roi_dir, "-o", out_roi,
                      "--subjects", "CSI1", "CSI2"])
        prepare.main(["stimuli-paths", "-i", os.path.join(roi_dir, "stim_lists"),
                      "--bold-index", str(bold_pickle), "-o", out_roi])
        prepare.main(["split-stimuli",
                      "-i", os.path.join(roi_dir, "stim_lists",
                                         "CSI01_stim_lists.txt"),
                      "-o", out_roi])
        prepare.main(["pack", "-i", out_roi, "-o", str(tmp_path / "packed"),
                      "--subjects", "CSI1", "CSI2", "--crop", "32",
                      "--size", "16"])
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert lines[0] == {"CSI1": [10, 15], "CSI2": [10, 15]}
    assert lines[1] == {"CSI1": 10, "CSI2": 10}
    assert lines[2] == {"train": 9, "valid": 1}
    packed = np.load(tmp_path / "packed" / "bold_train.npz")
    assert packed["fmri"].shape[1] == 15
    assert packed["images"].shape[1:] == (16, 16, 3)
    assert os.path.exists(tmp_path / "packed" / "bold_valid.pickle")


def test_prepare_external_data_filters_grey(image_dir, tmp_path):
    from fmri_tpu.data import prepare_external_data

    out = prepare_external_data(image_dir,
                                pickle_path=str(tmp_path / "rgb.pickle"),
                                save=True)
    assert len(out) == 6  # the grey.png is filtered out
    assert all("grey" not in p for p in out)
    with open(tmp_path / "rgb.pickle", "rb") as f:
        assert pickle.load(f) == out


def test_synthetic_structured_data():
    from fmri_tpu.data.synthetic import synthetic_images, synthetic_pairs

    imgs, factors = synthetic_images(8, 16, seed=0)
    assert imgs.shape == (8, 16, 16, 3) and factors.shape == (8, 13)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # deterministic
    imgs2, _ = synthetic_images(8, 16, seed=0)
    np.testing.assert_array_equal(imgs, imgs2)
    # images are structured (not iid noise): neighbouring pixels correlate
    dx = np.abs(np.diff(imgs, axis=2)).mean()
    assert dx < 0.1

    pairs = synthetic_pairs(16, 16, num_voxels=32, seed=1)
    assert pairs["fmri"].shape == (16, 32)
    np.testing.assert_allclose(pairs["fmri"].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(pairs["fmri"].std(0), 1.0, atol=1e-4)


def test_device_iterator_propagates_producer_errors():
    """A failure inside the prefetch thread must raise in the consumer, not
    silently truncate the epoch."""

    def bad_batches():
        yield np.zeros((4, 2), np.float32)
        raise RuntimeError("decode exploded")

    it = device_iterator(bad_batches(), prefetch=2)
    first = next(it)
    assert first.shape == (4, 2)
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(it)


def test_bold5000_volumes_peak_frames(tmp_path, image_dir):
    """Raw-session dataset: 4-D NIfTI load + peak-frame averaging
    (data_loader.py:26-85; window trial*5+2 : trial*5+4 at :75)."""
    from fmri_tpu.data import Bold5000Volumes

    rng = np.random.default_rng(11)
    vol = rng.normal(size=(4, 5, 6, 15)).astype(np.float32)
    fpath = str(tmp_path / "run.nii.gz")
    nifti.save(fpath, vol)
    img = os.path.join(image_dir, "img_000.png")
    ds = Bold5000Volumes([fpath], [img], trials=[2])  # 1-based trial 2
    assert len(ds) == 1
    s = ds.get(0)
    # trial 2 -> t0 = (2-1)*5 = 5; frames 7:9 averaged; axes -> (z, x, y)
    expect = vol[..., 7:9].mean(axis=3).transpose(2, 0, 1)
    np.testing.assert_allclose(s["fmri"], expect, rtol=1e-6)
    assert s["image"].shape[2] == 3


def test_extract_roi_by_mask(tmp_path):
    """Mask-based extraction from an fmriprep-style layout: 5-TR stimulus
    windows from events onsets (onset/2 = start TR) + trailing no-stimulus
    window (roi_extraction.py:16-104)."""
    import csv as _csv

    from fmri_tpu.data.etl import extract_roi_by_mask

    rng = np.random.default_rng(12)
    # mask: 3x3x2 volume, 4 voxels active
    mask = np.zeros((3, 3, 2), np.float32)
    mask.flat[[0, 5, 9, 12]] = 1.0
    mdir = tmp_path / "spm" / "CSI1"
    mdir.mkdir(parents=True)
    nifti.save(str(mdir / "mask.nii.gz"), mask)

    # preproc run: 20 TRs
    img = rng.normal(size=(3, 3, 2, 20)).astype(np.float32)
    pdir = tmp_path / "fmriprep" / "CSI1" / "ses-01" / "func"
    pdir.mkdir(parents=True)
    nifti.save(str(pdir / "sub-CSI1_ses-01_task-5000scenes_run-01_preproc.nii.gz"),
               img)

    # events: onsets 6s and 16s -> TRs 3 and 8
    edir = tmp_path / "events" / "sub-CSI1" / "ses-01" / "func"
    edir.mkdir(parents=True)
    with open(edir / "sub-CSI1_ses-01_task-5000scenes_run-01_events.tsv", "w") as f:
        w = _csv.writer(f, delimiter="\t")
        w.writerow(["onset", "ImgName"])
        w.writerow([6.0, "a.png"])
        w.writerow([16.0, "b.png"])

    out = extract_roi_by_mask(str(tmp_path / "fmriprep"),
                              str(tmp_path / "events"),
                              str(tmp_path / "spm"))
    X, Y, meta = out["CSI1"]
    # 2 stimulus windows + 1 trailing no-stimulus window (20 - 13 >= 5)
    assert Y == ["a.png", "b.png", "none"]
    assert X[0].shape == (5, 4)  # 5 TRs x 4 masked voxels
    roi = img[mask.astype(bool)]
    np.testing.assert_allclose(X[0], roi[:, 3:8].T, rtol=1e-6)
    np.testing.assert_allclose(X[1], roi[:, 8:13].T, rtol=1e-6)
    np.testing.assert_allclose(X[2], roi[:, 13:18].T, rtol=1e-6)


def test_nifti_big_endian(tmp_path):
    """Big-endian NIfTI-1 (legacy scanners write BE): header byte order is
    detected from sizeof_hdr and data decoded accordingly."""
    import struct

    vol = np.arange(24, dtype=">i2").reshape(2, 3, 4)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    dim = [3, 2, 3, 4, 1, 1, 1, 1]
    struct.pack_into(">8h", hdr, 40, *dim)
    struct.pack_into(">h", hdr, 70, 4)    # int16
    struct.pack_into(">h", hdr, 72, 16)   # bitpix
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">2f", hdr, 112, 1.0, 0.0)
    hdr[344:348] = b"n+1\x00"
    path = tmp_path / "be.nii"
    with open(path, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4 + vol.tobytes(order="F"))
    img = nifti.load(str(path))
    np.testing.assert_array_equal(img.get_fdata(), vol.astype(np.float64))


def test_path_helpers():
    from fmri_tpu.data.etl import get_fmri_path, get_identifier, snake_case

    assert get_fmri_path(1, 2, 3, "/root") == (
        "/root/sub-CSI1/ses-02/func/"
        "sub-CSI1_ses-02_task-5000scenes_run-03_bold.nii.gz")
    # identifier rules (data_utils.py:10-22)
    assert get_identifier("COCO_train2014_000000123456.jpg", "coco") == "123456"
    assert get_identifier("n01440764_10026.JPEG", "imagenet") == "n01440764_10026"
    assert get_identifier("beach_1.jpg", "scenes") == "beach_1"
    assert snake_case("LHEarlyVis") == "lh_early_vis"


class TestPackedStreaming:
    """Memory-mapped packed store (fmri_tpu.data.packed): datasets larger than
    host RAM stream from disk; float images round-trip through the uint8 codec
    within quantization error."""

    def test_dict_roundtrip_mmap(self, tmp_path):
        from fmri_tpu.data import Batches, is_packed_dir, open_packed, save_packed

        rng = np.random.default_rng(0)
        imgs = rng.uniform(0, 1, (10, 8, 8, 3)).astype(np.float32)
        fmri = rng.normal(size=(10, 5)).astype(np.float32)
        d = str(tmp_path / "packed")
        save_packed(d, {"image": imgs, "fmri": fmri})
        assert is_packed_dir(d)

        arrays, tf = open_packed(d)
        assert isinstance(arrays["image"], np.memmap)
        assert arrays["image"].dtype == np.uint8  # quantized on disk
        assert arrays["fmri"].dtype == np.float32  # fmri untouched

        batch = next(iter(Batches(arrays, 4, transform=tf)))
        assert batch["image"].dtype == np.float32
        assert not isinstance(batch["image"], np.memmap)
        np.testing.assert_allclose(batch["image"], imgs[:4], atol=1 / 255.0)
        np.testing.assert_array_equal(batch["fmri"], fmri[:4])

    def test_single_array_and_shuffle_determinism(self, tmp_path):
        from fmri_tpu.data import Batches, open_packed, save_packed

        imgs = np.random.default_rng(1).uniform(0, 1, (9, 4, 4, 3)).astype(
            np.float32)
        d = str(tmp_path / "packed1")
        save_packed(d, imgs)
        arr, tf = open_packed(d)
        assert arr.shape == (9, 4, 4, 3) and arr.dtype == np.uint8

        got = np.concatenate(list(Batches(arr, 3, shuffle=True, seed=7,
                                          transform=tf)))
        ref = np.concatenate(list(Batches(imgs, 3, shuffle=True, seed=7)))
        np.testing.assert_allclose(got, ref, atol=1 / 255.0)

    def test_quantize_clips_out_of_range(self, tmp_path):
        """Floats outside [0,1] must clip, not wrap modulo 256."""
        from fmri_tpu.data import open_packed, save_packed

        bad = np.array([[[[-0.5, 0.5, 1.2]]]], np.float32)  # [1,1,1,3]
        d = str(tmp_path / "clip")
        save_packed(d, {"image": bad})
        arr, tf = open_packed(d)
        got = tf(np.asarray(arr))
        np.testing.assert_allclose(got[0, 0, 0], [0.0, 0.5, 1.0], atol=1 / 255.0)

    def test_pack_images_streaming_matches_save_packed(self, tmp_path):
        """The out-of-core packer produces the same on-disk format/codec."""
        from fmri_tpu.data import open_packed, pack_images_streaming, save_packed

        rng = np.random.default_rng(3)
        imgs = rng.uniform(0, 1, (7, 4, 4, 3)).astype(np.float32)
        d1, d2 = str(tmp_path / "stream"), str(tmp_path / "bulk")
        pack_images_streaming(lambda i: imgs[i], len(imgs), (4, 4, 3), d1)
        save_packed(d2, imgs)
        a1, t1 = open_packed(d1)
        a2, t2 = open_packed(d2)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_allclose(t1(np.asarray(a1)), imgs, atol=1 / 255.0)
