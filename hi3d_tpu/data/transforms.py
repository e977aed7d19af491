"""cv2-backed image transforms (torchvision-equivalent, channels-last numpy).

Functional parity: the vendored `opencv_transforms` package
(reference dataset/opencv_transforms/{functional,transforms}.py) whose
`to_tensor` / `center_crop` the inference CLIs import
(pipeline_i2v_eval_v01.py:24). This module covers the functional surface on
numpy HWC arrays — the natural layout for a JAX host pipeline (no CHW
round-trip). `to_tensor` therefore returns float32 HWC in [0, 1].
"""

from __future__ import annotations

import numbers
from typing import Sequence, Tuple, Union

import numpy as np


def to_tensor(pic: np.ndarray) -> np.ndarray:
    """uint8/float HWC → float32 HWC in [0, 1] (reference functional.py to_tensor,
    minus the CHW permute — JAX is channels-last)."""
    pic = np.asarray(pic)
    if pic.ndim == 2:
        pic = pic[:, :, None]
    if pic.dtype == np.uint8:
        return pic.astype(np.float32) / 255.0
    return pic.astype(np.float32)


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def _size_pair(size) -> Tuple[int, int]:
    if isinstance(size, numbers.Number):
        return int(size), int(size)
    return int(size[0]), int(size[1])


def resize(img: np.ndarray, size, interpolation: str = "bilinear") -> np.ndarray:
    """torchvision semantics: int size → shorter side, keep aspect."""
    import cv2

    interp = {
        "nearest": cv2.INTER_NEAREST,
        "bilinear": cv2.INTER_LINEAR,
        "bicubic": cv2.INTER_CUBIC,
        "area": cv2.INTER_AREA,
        "lanczos": cv2.INTER_LANCZOS4,
    }[interpolation]
    h, w = img.shape[:2]
    if isinstance(size, numbers.Number):
        size = int(size)
        if (w <= h and w == size) or (h <= w and h == size):
            return img
        if w < h:
            return cv2.resize(img, (size, int(size * h / w)), interpolation=interp)
        return cv2.resize(img, (int(size * w / h), size), interpolation=interp)
    th, tw = _size_pair(size)
    return cv2.resize(img, (tw, th), interpolation=interp)


def crop(img: np.ndarray, i: int, j: int, h: int, w: int) -> np.ndarray:
    return img[i : i + h, j : j + w]


def center_crop(img: np.ndarray, output_size) -> np.ndarray:
    th, tw = _size_pair(output_size)
    h, w = img.shape[:2]
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    return crop(img, i, j, th, tw)


def pad(img: np.ndarray, padding, fill=0, padding_mode: str = "constant"):
    if isinstance(padding, numbers.Number):
        pl = pr = pt = pb = int(padding)
    elif len(padding) == 2:
        pl, pt = padding
        pr, pb = padding
    else:
        pl, pt, pr, pb = padding
    spec = [(pt, pb), (pl, pr)] + [(0, 0)] * (img.ndim - 2)
    if padding_mode == "constant":
        return np.pad(img, spec, constant_values=fill)
    return np.pad(img, spec, mode=padding_mode)


def hflip(img: np.ndarray) -> np.ndarray:
    return img[:, ::-1]


def vflip(img: np.ndarray) -> np.ndarray:
    return img[::-1]


def rotate(img: np.ndarray, angle: float, expand: bool = False) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    center = (w / 2.0, h / 2.0)
    m = cv2.getRotationMatrix2D(center, angle, 1.0)
    if expand:
        cos, sin = abs(m[0, 0]), abs(m[0, 1])
        nw = int(h * sin + w * cos)
        nh = int(h * cos + w * sin)
        m[0, 2] += nw / 2.0 - center[0]
        m[1, 2] += nh / 2.0 - center[1]
        w, h = nw, nh
    return cv2.warpAffine(img, m, (w, h))


def resized_crop(img, i, j, h, w, size, interpolation="bilinear"):
    return resize(crop(img, i, j, h, w), size, interpolation)


def five_crop(img: np.ndarray, size):
    th, tw = _size_pair(size)
    h, w = img.shape[:2]
    if th > h or tw > w:
        raise ValueError("crop size larger than input")
    tl = crop(img, 0, 0, th, tw)
    tr = crop(img, 0, w - tw, th, tw)
    bl = crop(img, h - th, 0, th, tw)
    br = crop(img, h - th, w - tw, th, tw)
    cc = center_crop(img, (th, tw))
    return tl, tr, bl, br, cc


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    out = img.astype(np.float32) * factor
    hi = 255.0 if np.issubdtype(img.dtype, np.integer) else 1.0
    return np.clip(out, 0, hi).astype(img.dtype)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    gray = img.astype(np.float32)
    if img.ndim == 3 and img.shape[-1] == 3:
        gray = gray @ np.asarray([0.299, 0.587, 0.114], np.float32)
    mean = round(gray.mean())
    out = img.astype(np.float32) * factor + mean * (1 - factor)
    hi = 255.0 if np.issubdtype(img.dtype, np.integer) else 1.0
    return np.clip(out, 0, hi).astype(img.dtype)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = (img.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], np.float32))
    gray = np.round(gray)[..., None]
    out = img.astype(np.float32) * factor + gray * (1 - factor)
    hi = 255.0 if np.issubdtype(img.dtype, np.integer) else 1.0
    return np.clip(out, 0, hi).astype(img.dtype)
