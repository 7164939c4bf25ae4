"""Memory-mapped packed datasets: stream from disk instead of loading to RAM.

The reference re-decodes JPEGs in DataLoader workers every epoch
(``data_loader.py:346-371``) and its pickled datasets must fit in host memory.
The ``.npz`` caches in :mod:`fmri_tpu.data.datasets` fix the re-decode but
still decompress fully into RAM.  This module is the third tier, for datasets
larger than host RAM: each array is one raw ``.npy`` file opened with
``np.load(mmap_mode='r')``, so a batch gather touches only the pages it
indexes (the OS page cache is the prefetcher; the pipeline's producer thread
overlaps the reads with device compute).

Float image arrays are quantized to uint8 on save (the same ``x*255`` codec
the ``.npz`` caches use) and dequantized per batch by the ``transform``
returned from :func:`open_packed` — plugged into ``Batches(transform=...)``.

Layout: ``<dir>/meta.json`` + one ``<key>.npy`` per array.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

Arrays = Union[np.ndarray, Dict[str, np.ndarray]]

_META = "meta.json"


def _quantize_u8(v: np.ndarray) -> np.ndarray:
    """[0,1]-float -> uint8, clipped (out-of-range floats must not wrap)."""
    return (np.clip(v, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def pack_images_streaming(get_image, n: int, shape, out_dir: str,
                          key: str = "image", chunk: int = 256) -> None:
    """Out-of-core packing: write ``<out_dir>/<key>.npy`` (uint8) one image at
    a time via a numpy memmap, so datasets larger than host RAM can be packed
    without ever materializing the float array.  ``get_image(i)`` returns one
    float [0,1] image of ``shape``.
    """
    os.makedirs(out_dir, exist_ok=True)
    out = np.lib.format.open_memmap(
        os.path.join(out_dir, f"{key}.npy"), mode="w+", dtype=np.uint8,
        shape=(n, *shape))
    for i in range(n):
        out[i] = _quantize_u8(np.asarray(get_image(i), np.float32))
        if chunk and (i + 1) % chunk == 0:
            out.flush()
    out.flush()
    del out
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"keys": [key], "quantized": [key], "num_examples": n}, f,
                  indent=2)


def save_packed(out_dir: str, arrays: Arrays, *,
                quantize: Sequence[str] = ("image", "images")) -> None:
    """Write arrays (or one array, stored under key 'image') as raw ``.npy``
    files.  float32 arrays named in ``quantize`` are stored uint8."""
    if not isinstance(arrays, dict):
        arrays = {"image": arrays}
    os.makedirs(out_dir, exist_ok=True)
    quantized = []
    n = None
    for k, v in arrays.items():
        v = np.asarray(v)
        n = len(v) if n is None else n
        if len(v) != n:
            raise ValueError(f"array '{k}' length {len(v)} != {n}")
        if k in quantize:
            if v.dtype != np.uint8:
                v = _quantize_u8(v)
            quantized.append(k)  # already-uint8 inputs use the same codec
        np.save(os.path.join(out_dir, f"{k}.npy"), v)
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"keys": sorted(arrays), "quantized": quantized,
                   "num_examples": n}, f, indent=2)


def open_packed(out_dir: str, *, mmap: bool = True
                ) -> Tuple[Arrays, Optional[Callable[[Arrays], Arrays]]]:
    """Open a packed dir as (arrays, per-batch transform).

    ``arrays`` are memory-mapped (read-only) unless ``mmap=False``; the
    transform dequantizes uint8-stored float arrays back to float32 in [0,1]
    (None if nothing was quantized).  Feed both straight into
    ``Batches(arrays, bs, transform=transform)``.
    """
    with open(os.path.join(out_dir, _META)) as f:
        meta = json.load(f)
    mode = "r" if mmap else None
    arrays = {k: np.load(os.path.join(out_dir, f"{k}.npy"), mmap_mode=mode)
              for k in meta["keys"]}
    quantized = set(meta["quantized"])

    transform = None
    if quantized:
        def _dq(v: np.ndarray) -> np.ndarray:
            # single pass: cast and scale together (no intermediate float copy)
            return np.divide(v, 255.0, dtype=np.float32)

        def transform(batch: Arrays) -> Arrays:
            if not isinstance(batch, dict):
                return _dq(batch)
            return {k: (_dq(v) if k in quantized else v)
                    for k, v in batch.items()}

    if set(arrays) == {"image"}:
        one = arrays["image"]
        if transform is not None:
            t = transform
            return one, lambda b: t({"image": b})["image"]
        return one, None
    return arrays, transform


def is_packed_dir(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, _META))
