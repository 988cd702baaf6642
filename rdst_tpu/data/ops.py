"""Host-side (numpy/cv2) image ops for the data pipeline.

Behavioral parity targets (reference file:line):
* resize          — /root/reference/datasets/basic_dataset.py:64-123
* normalize       — basic_dataset.py:57-62
* random crops    — basic_dataset.py:482-539 (SingleImageRandomCrop,
                    SRImagePairRandomCrop; size==0 means fixed margin trim)
* centre crop     — basic_dataset.py:542-555
* edge padding    — basic_dataset.py:558-604 (ImagePadding pad/ipad)

LR training inputs are generated with cv2 INTER_CUBIC, which defines the
SR task itself, so the host path keeps cv2 exactly. The jit'd device
equivalents live in ops_jax.py and are numerically gated against these.

RNG discipline: the reference uses the global np.random state. Here every
stochastic op takes an explicit ``rng: np.random.Generator`` so data
order is reproducible and shardable across hosts.
"""

from __future__ import annotations

import math
import os
from typing import Iterable, Optional, Sequence, Tuple, Union

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - image path falls back to native
    cv2 = None


def _native_backend():
    """The C++ backend (rdst_tpu.native) when selected or when cv2 is
    absent; None otherwise."""
    if cv2 is not None and os.environ.get("RDST_TPU_NATIVE", "") != "1":
        return None
    from rdst_tpu import native

    return native if native.available() else None

Size2 = Tuple[int, int]

_INTERP = {} if cv2 is None else {
    None: cv2.INTER_CUBIC,
    "cubic": cv2.INTER_CUBIC,
    "linear": cv2.INTER_LINEAR,
    "nearest": cv2.INTER_NEAREST,
}


def normalize(imgs: np.ndarray):
    """Min/max normalize to [0, 1]; returns (normed, min, max)."""
    min_val = np.min(imgs)
    max_val = np.max(imgs)
    return (imgs - min_val) / (max_val - min_val), min_val, max_val


def _out_size(img: np.ndarray, size) -> Size2:
    if isinstance(size, (float, int)):
        size = [size, size]
    if not isinstance(size, (list, tuple)):
        raise TypeError("resize size must be float, int, list or tuple")
    if isinstance(size[0], float):
        size = int(img.shape[0] * size[0]), int(img.shape[1] * size[1])
    if size[0] <= 0 or size[1] <= 0:
        raise ValueError("resize output size must be positive")
    return int(size[0]), int(size[1])


def resize(
    img: np.ndarray,
    size,
    interpolation: Optional[str] = "cubic",
    blur_method: Optional[str] = None,
    blur_kernel: int = 3,
    blur_sigma: float = 0.0,
) -> np.ndarray:
    """cv2 resize in (rows, cols) convention + optional gaussian blur.

    ``size`` is (H, W) or a scalar/pair of float scale factors. Preserves
    a trailing channel axis even when cv2 squeezes single channels.
    """
    h, w = _out_size(img, size)
    native = _native_backend()
    if (h, w) == img.shape[:2]:
        out = img
    elif (native is not None and interpolation in (None, "cubic")
          and blur_method != "gaussian"):
        out = native.resize_bicubic(np.asarray(img, np.float32), (h, w))
    elif cv2 is None:
        raise RuntimeError(
            f"resize(interpolation={interpolation!r}, blur={blur_method!r}) "
            "needs cv2; only the bicubic path has a native backend")
    else:
        out = cv2.resize(img, dsize=(w, h), interpolation=_INTERP[interpolation])
    if blur_method == "gaussian":
        out = cv2.GaussianBlur(out, (blur_kernel, blur_kernel), blur_sigma)
    if img.ndim != out.ndim:
        out = out[:, :, np.newaxis]
    return out


def _pair(v: Union[int, Sequence[int]], name: str = "value") -> Size2:
    if isinstance(v, (int, np.integer)):
        return int(v), int(v)
    if isinstance(v, (list, tuple)) and len(v) == 2:
        return int(v[0]), int(v[1])
    raise TypeError(f"{name} must be an int or a pair of ints")


def margin_trim(img: np.ndarray, margin: Union[int, Size2]) -> np.ndarray:
    """Trim a fixed margin from both spatial borders (crop size == 0 path)."""
    m = _pair(margin, "margin")
    return img[m[0] : img.shape[0] - m[0], m[1] : img.shape[1] - m[1]]


def random_crop(
    img: np.ndarray,
    size: Union[int, Size2],
    margin: Union[int, Size2] = 0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Random spatial crop of ``size``, keeping ``margin`` off the borders."""
    size = _pair(size, "size")
    if size == (0, 0):
        return margin_trim(img, margin)
    m = _pair(margin, "margin")
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    top = int(rng.integers(m[0], h - size[0] - m[0] + 1))
    left = int(rng.integers(m[1], w - size[1] - m[1] + 1))
    return img[top : top + size[0], left : left + size[1]]


def paired_random_crop(
    lr: np.ndarray,
    hr: np.ndarray,
    size: Union[int, Size2],
    sr_factor: int,
    margin: Union[int, Size2] = 0,
    rng: Optional[np.random.Generator] = None,
):
    """Aligned random crop of an (LR, HR) pair; ``size``/``margin`` in LR units
    (margin given in HR units, divided down as the reference does)."""
    sr_factor = int(sr_factor)
    m = tuple(v // sr_factor for v in _pair(margin, "margin"))
    size = _pair(size, "size")
    if size == (0, 0):
        return (
            lr[m[0] : lr.shape[0] - m[0], m[1] : lr.shape[1] - m[1]],
            hr[
                m[0] * sr_factor : hr.shape[0] - m[0] * sr_factor,
                m[1] * sr_factor : hr.shape[1] - m[1] * sr_factor,
            ],
        )
    rng = rng or np.random.default_rng()
    h, w = lr.shape[:2]
    # +1 on the high bound: exact-fit crops are valid (the reference's
    # SRImagePairRandomCrop raises on them — latent off-by-one, not kept)
    top = int(rng.integers(m[0], h - size[0] - m[0] + 1))
    left = int(rng.integers(m[1], w - size[1] - m[1] + 1))
    return (
        lr[top : top + size[0], left : left + size[1]],
        hr[
            top * sr_factor : (top + size[0]) * sr_factor,
            left * sr_factor : (left + size[1]) * sr_factor,
        ],
    )


def centre_crop(img: np.ndarray, size: Union[int, Size2]) -> np.ndarray:
    size = _pair(size, "size")
    h, w = img.shape[:2]
    top = max((h - size[0]) // 2, 0)
    left = max((w - size[1]) // 2, 0)
    return img[top : top + size[0], left : left + size[1]]


class ImagePadding:
    """Edge-pad images up to a target spatial size, with exact inverse.

    Padding is split ceil-before / floor-after per axis; negative padding
    (input larger than target) is clamped to zero, matching the reference.
    """

    def __init__(self, input_shape, output_shape):
        i = _pair(input_shape, "input_shape")
        o = _pair(output_shape, "output_shape")
        padding = []
        for a, b in zip(i, o):
            padding.append(math.ceil((b - a) / 2))
            padding.append(math.floor((b - a) / 2))
        self.padding = [max(p, 0) for p in padding]

    def pad(self, x: np.ndarray) -> np.ndarray:
        p = self.padding
        if x.ndim == 3:
            return np.pad(x, (p[:2], p[2:], [0, 0]), "edge")
        if x.ndim == 2:
            return np.pad(x, (p[:2], p[2:]), "edge")
        raise ValueError("pad expects a 2D or 3D array")

    def ipad(self, x: np.ndarray) -> np.ndarray:
        p = self.padding
        h, w = x.shape[:2]
        return x[p[0] : h - p[1], p[2] : w - p[3]]


def dihedral(img: np.ndarray, k: int) -> np.ndarray:
    """One of the 8 dihedral transforms (rot90 x k%4, flip if k>=4)."""
    native = _native_backend()
    if native is not None and img.ndim in (2, 3):
        out = np.asarray(img, np.float32)
        if k >= 4:
            out = native.fliplr(out)
        for _ in range(k % 4):  # np.rot90 == flipud(transpose)
            out = native.flipud(native.transpose(out))
        return out
    if k >= 4:
        img = img[:, ::-1]
    return np.ascontiguousarray(np.rot90(img, k % 4))


def stack_to_nhwc(imgs: Iterable[np.ndarray]) -> np.ndarray:
    """Stack HWC images into an NHWC float32 batch (TPU-native layout)."""
    a = np.asarray(list(imgs) if not isinstance(imgs, np.ndarray) else imgs)
    if a.ndim == 3:  # N,H,W -> N,H,W,1
        a = a[..., np.newaxis]
    if a.ndim != 4:
        raise ValueError("expected a stack of HW or HWC images")
    return np.ascontiguousarray(a, dtype=np.float32)
