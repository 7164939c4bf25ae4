"""Image transforms, split TPU-first into a host decode path and a device path.

The reference runs its whole transform stack per item inside DataLoader worker
processes (skimage resize, scipy shift, per-channel loops;
``data_preprocessing/data_loader.py:88-217``).  Here the split is:

  * **host (once per image, cacheable)**: decode -> center-crop -> resize ->
    grey-to-color, producing fixed-shape float32 HWC in [0, 1].  This is the
    variable-shape part XLA cannot take.
  * **device (per batch, inside jit)**: random horizontal flip (Stage-I train,
    ``train_vgan_stage1.py:166``), random shift (Stage-II/III train,
    ``data_loader.py:187-217``), normalization (``data_loader.py:88-110``) —
    all batched/vmapped so XLA fuses them into the step's prologue.

Semantics parity notes:
  * ``random_shift_batch`` reproduces ``scipy.ndimage.shift(order=0,
    mode='nearest')`` for integer shifts: out[i, j] = in[clip(i - dy),
    clip(j - dx)] (``data_loader.py:206-217``).
  * ``center_crop`` matches the reference's integer-floor window
    (``data_loader.py:155-161``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------- host-side (numpy / PIL) -------------------------


def center_crop(img: np.ndarray, crop: int) -> np.ndarray:
    """Center crop an HWC array (reference ``CenterCrop.__call__``,
    ``data_loader.py:155-161``; crops are silently smaller if the image is)."""
    h, w = img.shape[:2]
    y0 = max(h // 2 - crop // 2, 0)
    x0 = max(w // 2 - crop // 2, 0)
    return img[y0 : y0 + crop, x0 : x0 + crop]


def resize_image(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize HWC float array to (size, size) via PIL (the reference
    uses torchvision/PIL for COCO and skimage for BOLD;
    ``train_vgan_stage1.py:164``, ``data_loader.py:130``)."""
    from PIL import Image

    if img.ndim == 2:
        img = img[:, :, None]
    arr = np.clip(img, 0.0, 1.0)
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    pil = Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8))
    out = pil.resize((size, size), Image.BILINEAR)
    return np.asarray(out, dtype=np.float32) / 255.0


def grey_to_color(img: np.ndarray) -> np.ndarray:
    """1-channel -> 3-channel HWC (reference ``GreyToColor``,
    ``data_loader.py:374-400``)."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        return np.repeat(img, 3, axis=2)
    if img.shape[2] == 4:  # RGBA PNGs: drop alpha
        return img[:, :, :3]
    return img


def decode_image(path: str) -> np.ndarray:
    """Decode an image file to float32 HWC in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    return grey_to_color(arr)


def load_stimulus(path: str, crop: int, size: int) -> np.ndarray:
    """Full host decode path: decode -> center-crop -> resize -> [0,1] HWC3."""
    return resize_image(center_crop(decode_image(path), crop), size)


# ------------------------- device-side (jax, batched) -------------------------


def normalize(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """Per-channel (x - mean) / std on NHWC images in [0, 1]
    (``data_loader.py:88-110`` / ``transforms.Normalize``)."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def denormalize(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return x * std + mean


def random_flip_batch(rng: jax.Array, x: jax.Array) -> jax.Array:
    """Per-sample horizontal flip with p=0.5 (``transforms.RandomHorizontalFlip``
    in the Stage-I train pipeline, ``train_vgan_stage1.py:166``).  NHWC."""
    flip = jax.random.bernoulli(rng, 0.5, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


def _shift_one(img: jax.Array, dy: jax.Array, dx: jax.Array) -> jax.Array:
    h, w = img.shape[0], img.shape[1]
    rows = jnp.clip(jnp.arange(h) - dy, 0, h - 1)
    cols = jnp.clip(jnp.arange(w) - dx, 0, w - 1)
    return img[rows][:, cols]


def random_shift_batch(rng: jax.Array, x: jax.Array, max_shift: int = 5) -> jax.Array:
    """Per-sample integer translation with nearest-edge fill, shifts uniform in
    [-max_shift, max_shift] (reference ``rand_shift``,
    ``data_loader.py:206-217``).  NHWC."""
    if max_shift <= 0:
        return x
    shifts = jax.random.randint(rng, (x.shape[0], 2), -max_shift, max_shift + 1)
    return jax.vmap(_shift_one)(x, shifts[:, 0], shifts[:, 1])


def train_augment(rng: jax.Array, x: jax.Array, *, flip: bool = False,
                  max_shift: int = 0,
                  mean: Sequence[float] = (0.5, 0.5, 0.5),
                  std: Sequence[float] = (0.5, 0.5, 0.5)) -> jax.Array:
    """The fused device-side train-time pipeline: [flip] -> [shift] -> normalize.

    Stage-I COCO uses ``flip=True, max_shift=0``; Stage-II/III BOLD uses
    ``flip=False, max_shift=5``; eval uses neither (normalize only).

    uint8 batches (the mmap streaming store ``fmri_tpu.data.packed``, shipped
    to the device undecoded for 4x less H2D traffic) are dequantized here,
    on device.
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    k_flip, k_shift = jax.random.split(rng)
    if flip:
        x = random_flip_batch(k_flip, x)
    if max_shift:
        x = random_shift_batch(k_shift, x, max_shift)
    return normalize(x, mean, std)


def eval_preprocess(x: jax.Array, mean: Sequence[float] = (0.5, 0.5, 0.5),
                    std: Sequence[float] = (0.5, 0.5, 0.5)) -> jax.Array:
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return normalize(x, mean, std)


def resize_batch(x: jax.Array, size: int) -> jax.Array:
    """Bilinear NHWC batch resize on device (used when saving reconstructions
    at 200px, ``inference_gan.py:273-275``)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bilinear")
