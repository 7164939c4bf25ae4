"""Host data-path microbenchmark: native C++ loader vs numpy.

Measures the per-batch host work of the packed streaming store — shuffled
row gather (what `Batches.__iter__` does every batch) and fused
uint8->float32 dequant — native (`fmri_tpu/native`) vs plain numpy, plus a
full `Batches` epoch both ways.  Run on the target host:

    python benchmarks/native_loader_bench.py [n_rows] [batch]

Numbers are best-of-5 wall times (single process; the native calls release
the GIL, which this benchmark cannot show — see docstring in
`fmri_tpu/native/__init__.py`).
"""

import json
import sys
import time

import numpy as np

from fmri_tpu import native


def best_of(fn, reps=5, inner=10):
    fn()  # warm allocator/pages
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            fn()
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(n, 64, 64, 3), dtype=np.uint8)
    idx = rng.permutation(n)[:bs].astype(np.int64)
    rows = {}
    rows["gather_numpy_ms"] = best_of(lambda: arr[idx]) * 1e3
    rows["dequant2pass_numpy_ms"] = best_of(
        lambda: np.divide(arr[idx], 255.0, dtype=np.float32)) * 1e3
    if native.available():
        rows["gather_native_ms"] = best_of(lambda: native.gather(arr, idx)) * 1e3
        rows["dequant_fused_native_ms"] = best_of(
            lambda: native.gather_dequant(arr, idx)) * 1e3
    else:
        rows["native_unavailable"] = native.why_unavailable()

    from fmri_tpu.data.pipeline import Batches

    def epoch():
        for _ in Batches(arr, bs, shuffle=True, seed=1):
            pass

    rows["batches_epoch_ms"] = best_of(epoch, reps=3, inner=1) * 1e3
    rows["imgs_per_s_host"] = (n // bs) * bs / (rows["batches_epoch_ms"] / 1e3)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
