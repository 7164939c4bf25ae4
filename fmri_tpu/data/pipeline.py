"""Input pipeline: packed host arrays -> fixed-shape device batches.

Replaces the reference's ``torch.utils.data.DataLoader`` with
``num_workers=4`` spawn-mode worker processes re-decoding JPEGs every epoch
(``data_loader.py:23``, ``train_vgan_stage1.py:195-196``).  Here the decode
happened once at pack time (``fmri_tpu.data.datasets``); an epoch is pure
array indexing, so the host never bottlenecks the TPU:

  * seeded epoch shuffling (reference relies on torch's global seed);
  * drop-remainder batching — every batch has the same static shape, so the
    train step compiles exactly once;
  * asynchronous device placement: ``jax.device_put`` of batch N+1 is issued
    while batch N computes (double buffering), optionally with a
    ``jax.sharding.Mesh`` so each host shard lands on its data-parallel
    device slice directly.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Any, Dict, Iterator, Union

import jax
import numpy as np

Batch = Union[np.ndarray, Dict[str, np.ndarray]]


def _num_examples(data: Batch) -> int:
    if isinstance(data, dict):
        return len(next(iter(data.values())))
    return len(data)


def _gather(v: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Row gather, through the native C++ loader where it wins; numpy fancy
    indexing otherwise.  Measured on-host (benchmarks/native_loader_bench.py):
    for in-RAM arrays on a single core the two are equal per-op (both
    memcpy-bound) and the ctypes wrapper only adds overhead, so native is
    used when it buys something — mapped arrays (the call releases the GIL,
    so the producer thread's page-fault IO overlaps the main thread) or a
    multi-core host (parallel row copy)."""
    if isinstance(v, np.ndarray):
        from fmri_tpu import native

        if isinstance(v, np.memmap) or native._threads_default() > 1:
            return native.gather(v, idx)
    return v[idx]


def _index(data: Batch, idx: np.ndarray) -> Batch:
    if isinstance(data, dict):
        return {k: _gather(v, idx) for k, v in data.items()}
    return _gather(data, idx)


def _prefetch_rows(data: Batch, idx: np.ndarray) -> None:
    """madvise(WILLNEED) the next batch's rows (no-op without the native
    library): on mmap-streamed datasets bigger than the page cache the
    kernel reads ahead while the current batch computes.  Only mapped
    arrays are hinted — in-RAM arrays have nothing to read ahead."""
    from fmri_tpu import native

    if isinstance(data, dict):
        for v in data.values():
            if isinstance(v, np.memmap):
                native.prefetch(v, idx)
    elif isinstance(data, np.memmap):
        native.prefetch(data, idx)


class Batches:
    """Deterministic batcher over packed arrays (or dicts of arrays).

    ``shuffle=True`` reshuffles every epoch from ``seed`` + epoch index, the
    functional analogue of the reference's ``DataLoader(shuffle=True)`` under
    its global ``torch.manual_seed`` (``train_vgan_stage1.py:123``).
    """

    def __init__(self, data: Batch, batch_size: int, *, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True, transform=None):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # per-batch host transform, applied after indexing — e.g. the uint8
        # dequantizer from fmri_tpu.data.packed (streaming mmap datasets)
        self.transform = transform
        self.epoch = 0
        n = _num_examples(data)
        if drop_last:
            self.num_batches = n // batch_size
        else:
            self.num_batches = (n + batch_size - 1) // batch_size
        if self.num_batches == 0:
            raise ValueError(
                f"dataset of {n} examples yields no batches of {batch_size}")

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Batch]:
        n = _num_examples(self.data)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        self.epoch += 1
        for b in range(self.num_batches):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            batch = _index(self.data, idx)
            if b + 1 < self.num_batches:  # hint the kernel one batch ahead
                _prefetch_rows(
                    self.data,
                    order[(b + 1) * self.batch_size : (b + 2) * self.batch_size])
            yield self.transform(batch) if self.transform is not None else batch


def device_iterator(batches, *, mesh=None, voxel_tp: bool = False,
                    prefetch: int = 2):
    """Wrap a host batch iterator with asynchronous device placement.

    With a mesh, batches are placed batch-axis-over-``data`` (and, for fMRI
    arrays under ``voxel_tp``, feature-axis-over-``model``) via
    ``fmri_tpu.parallel.mesh.shard_batch``; otherwise a plain ``device_put``.
    ``prefetch`` batches are staged ahead so H2D transfer overlaps compute.
    """
    from fmri_tpu.parallel.mesh import shard_batch

    def place(batch: Batch) -> Any:
        if mesh is not None:
            return shard_batch(batch, mesh, voxel_tp=voxel_tp)
        return jax.device_put(batch)

    if prefetch <= 0:
        for batch in batches:
            yield place(batch)
        return

    q: Queue = Queue(maxsize=prefetch)
    _END = object()
    _ERR = object()

    def producer():
        try:
            for batch in batches:
                q.put(place(batch))
        except BaseException as e:  # surface in the consumer, don't truncate
            q.put((_ERR, e))
        else:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            t.join()
            raise item[1]
        yield item
    t.join()
