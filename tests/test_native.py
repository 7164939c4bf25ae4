"""Native C++ loader kernels (`fmri_tpu/native`): numpy parity, fallback
behavior, and the pipeline integration (`data/pipeline.py: _gather`).

The reference's host data path is torch's C++ DataLoader workers
(`data_loader.py:23`); these tests pin our native counterpart to the same
semantics as plain numpy indexing so the two paths are interchangeable.
"""

import numpy as np
import pytest

from fmri_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.why_unavailable()}")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


class TestGather:
    @requires_native
    @pytest.mark.parametrize("shape,dtype", [
        ((50, 8, 8, 3), np.uint8),
        ((40, 37), np.float32),
        ((30,), np.int64),
        ((20, 5), np.float64),
    ])
    def test_matches_numpy(self, rng, shape, dtype):
        if np.issubdtype(dtype, np.integer):
            arr = rng.integers(0, 100, size=shape).astype(dtype)
        else:
            arr = rng.standard_normal(shape).astype(dtype)
        idx = rng.integers(0, shape[0], size=17)
        np.testing.assert_array_equal(native.gather(arr, idx), arr[idx])

    @requires_native
    def test_empty_single_repeat(self, rng):
        arr = rng.integers(0, 256, size=(10, 4), dtype=np.uint8)
        assert native.gather(arr, np.empty(0, np.int64)).shape == (0, 4)
        np.testing.assert_array_equal(
            native.gather(arr, np.array([3])), arr[[3]])
        np.testing.assert_array_equal(
            native.gather(arr, np.array([2, 2, 2])), arr[[2, 2, 2]])

    @requires_native
    def test_out_and_threads(self, rng):
        arr = rng.standard_normal((64, 9)).astype(np.float32)
        idx = rng.integers(0, 64, size=33)
        out = np.empty((33, 9), np.float32)
        res = native.gather(arr, idx, out=out, threads=3)
        assert res is out
        np.testing.assert_array_equal(out, arr[idx])

    @requires_native
    def test_out_of_range_raises(self, rng):
        arr = np.zeros((5, 2), np.float32)
        with pytest.raises(IndexError):
            native.gather(arr, np.array([5]))
        with pytest.raises(IndexError):
            native.gather(arr, np.array([-1]))

    def test_bad_idx_shape(self):
        with pytest.raises(ValueError):
            native.gather(np.zeros((4, 2)), np.zeros((2, 2), np.int64))

    def test_non_contiguous_falls_back(self, rng):
        arr = rng.standard_normal((40, 6)).astype(np.float32)[::2]
        assert not arr.flags["C_CONTIGUOUS"]
        idx = np.array([0, 3, 19])
        np.testing.assert_array_equal(native.gather(arr, idx), arr[idx])

    def test_object_dtype_falls_back(self):
        """Object arrays must never hit the native memcpy (it would copy
        PyObject pointers without refcounting -> double free); the wrapper
        routes them to numpy indexing."""
        arr = np.empty(6, dtype=object)
        arr[:] = [("row", i) for i in range(6)]
        got = native.gather(arr, np.array([4, 0, 4]))
        assert list(got) == [("row", 4), ("row", 0), ("row", 4)]

    def test_bad_out_rejected(self, rng):
        """The native kernels write raw bytes through ``out``'s pointer:
        wrong shape/dtype/layout must raise, not corrupt the heap.  Same
        contract on the numpy fallback path."""
        arr = rng.standard_normal((20, 4)).astype(np.float32)
        idx = np.array([1, 2, 3])
        with pytest.raises(ValueError):       # wrong shape
            native.gather(arr, idx, out=np.empty((2, 4), np.float32))
        with pytest.raises(TypeError):        # wrong dtype
            native.gather(arr, idx, out=np.empty((3, 4), np.float64))
        noncontig = np.empty((3, 8), np.float32)[:, ::2]
        with pytest.raises(ValueError):       # non-contiguous
            native.gather(arr, idx, out=noncontig)
        with pytest.raises(TypeError):        # dequant: out must be float32
            native.gather_dequant(
                np.zeros((9, 4), np.uint8), idx,
                out=np.empty((3, 4), np.uint8))


class TestGatherDequant:
    @requires_native
    def test_matches_numpy(self, rng):
        arr = rng.integers(0, 256, size=(60, 6, 6, 3), dtype=np.uint8)
        idx = rng.integers(0, 60, size=21)
        got = native.gather_dequant(arr, idx)
        assert got.dtype == np.float32
        np.testing.assert_allclose(
            got, arr[idx].astype(np.float32) / 255.0, rtol=0, atol=1e-7)

    @requires_native
    def test_codec_endpoints(self):
        """0 -> 0.0 and 255 -> 1.0 exactly (the packed-store codec)."""
        arr = np.array([[0, 255, 128]], np.uint8)
        got = native.gather_dequant(arr, np.array([0]))
        assert got[0, 0] == 0.0 and got[0, 1] == 1.0
        assert abs(got[0, 2] - 128 / 255) < 1e-7

    def test_rejects_non_uint8(self):
        with pytest.raises(TypeError):
            native.gather_dequant(np.zeros((3, 2), np.float32), np.array([0]))

    @requires_native
    def test_custom_scale_threads(self, rng):
        arr = rng.integers(0, 256, size=(16, 11), dtype=np.uint8)
        idx = np.arange(16)
        got = native.gather_dequant(arr, idx, scale=2.0, threads=2)
        np.testing.assert_allclose(got, arr.astype(np.float32) * 2.0)


class TestPrefetch:
    @requires_native
    def test_memmap_rows(self, rng, tmp_path):
        arr = rng.integers(0, 256, size=(32, 128), dtype=np.uint8)
        p = tmp_path / "a.npy"
        np.save(p, arr)
        m = np.load(p, mmap_mode="r")
        assert native.prefetch(m, np.array([0, 7, 31])) is True
        # rows remain readable and correct after the hint
        np.testing.assert_array_equal(m[7], arr[7])

    @requires_native
    def test_out_of_range_raises(self):
        with pytest.raises(IndexError):
            native.prefetch(np.zeros((2, 2), np.uint8), np.array([2]))


class TestFallback:
    def test_numpy_path_when_disabled(self, rng, monkeypatch):
        """With the library forced off, every entry point still works."""
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_lib_err", "forced off (test)")
        assert not native.available()
        arr = rng.integers(0, 256, size=(12, 5), dtype=np.uint8)
        idx = np.array([1, 4, 4, 0])
        np.testing.assert_array_equal(native.gather(arr, idx), arr[idx])
        out = np.empty((4, 5), np.uint8)
        assert native.gather(arr, idx, out=out) is out
        np.testing.assert_allclose(
            native.gather_dequant(arr, idx),
            arr[idx].astype(np.float32) / 255.0)
        assert native.prefetch(arr, idx) is False


class TestPipelineIntegration:
    def test_batches_identical_to_numpy_indexing(self, rng, tmp_path):
        """A packed-dir epoch through `Batches` (native gather + lookahead
        prefetch) equals direct numpy indexing with the same seed."""
        from fmri_tpu.data import Batches, open_packed, save_packed

        imgs = rng.random((40, 6, 6, 3)).astype(np.float32)
        fmri = rng.standard_normal((40, 19)).astype(np.float32)
        d = str(tmp_path / "packed")
        save_packed(d, {"image": imgs, "fmri": fmri})
        arrays, tf = open_packed(d)
        bs = Batches(arrays, 8, shuffle=True, seed=3, transform=tf)
        order = np.random.default_rng((3, 0)).permutation(40)
        for b, batch in enumerate(bs):
            take = order[b * 8:(b + 1) * 8]
            np.testing.assert_allclose(
                batch["image"],
                np.divide(arrays["image"][take], 255.0, dtype=np.float32))
            np.testing.assert_array_equal(batch["fmri"], fmri[take])

    def test_build_is_cached(self):
        """Second build call returns the same artifact without recompiling."""
        if not native.available():
            pytest.skip("no native library")
        from fmri_tpu.native.build import build_library

        p1 = build_library()
        import os
        mtime = os.path.getmtime(p1)
        assert build_library() == p1
        assert os.path.getmtime(p1) == mtime
