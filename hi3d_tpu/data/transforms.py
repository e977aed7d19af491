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


def ten_crop(img: np.ndarray, size, vertical_flip: bool = False):
    """five_crop of the image and of its flip (functional.py:312-343)."""
    first = five_crop(img, size)
    flipped = vflip(img) if vertical_flip else hflip(img)
    second = five_crop(flipped, size)
    return first + second


def adjust_hue(img: np.ndarray, hue_factor: float) -> np.ndarray:
    """Cyclic shift of the HSV hue channel (functional.py:419-463; PIL-HSV
    semantics: hue in [0, 255] with uint8 wraparound)."""
    if not -0.5 <= hue_factor <= 0.5:
        raise ValueError("hue_factor is not in [-0.5, 0.5].")
    if img.ndim == 2 or img.shape[-1] == 1:
        return img
    from PIL import Image

    pil = Image.fromarray(np.ascontiguousarray(img))
    h, s, v = pil.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    # uint8 wraparound handles the cyclic hue shift (reference relies on
    # legacy numpy overflow; emulate explicitly for modern numpy)
    np_h = (np_h.astype(np.int16) + int(hue_factor * 255)) % 256
    h = Image.fromarray(np_h.astype(np.uint8), "L")
    out = Image.merge("HSV", (h, s, v)).convert(pil.mode)
    return np.array(out)


def adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1) -> np.ndarray:
    """Power-law transform via uint8 LUT (functional.py:463-490)."""
    import cv2

    if gamma < 0:
        raise ValueError("Gamma should be a non-negative real number")
    table = np.array(
        [((i / 255.0) ** gamma) * 255 * gain for i in np.arange(0, 256)]
    ).astype("uint8")
    if img.ndim == 3 and img.shape[2] == 1:
        return cv2.LUT(img, table)[:, :, np.newaxis]
    return cv2.LUT(img, table)


def _get_affine_matrix(center, angle, translate, scale, shear):
    """M = T·C·RSS·C⁻¹ (functional.py:521-541)."""
    import math

    angle = math.radians(angle)
    shear = math.radians(shear)
    T = np.array([[1, 0, translate[0]], [0, 1, translate[1]], [0, 0, 1]])
    C = np.array([[1, 0, center[0]], [0, 1, center[1]], [0, 0, 1]])
    RSS = np.array(
        [
            [math.cos(angle) * scale, -math.sin(angle + shear) * scale, 0],
            [math.sin(angle) * scale, math.cos(angle + shear) * scale, 0],
            [0, 0, 1],
        ]
    )
    return (T @ C @ RSS @ np.linalg.inv(C))[:2, :]


def affine(
    img: np.ndarray,
    angle: float,
    translate,
    scale: float,
    shear: float,
    interpolation: str = "bilinear",
    mode: str = "constant",
    fillcolor=0,
) -> np.ndarray:
    """Center-invariant affine warp (functional.py:544-577)."""
    import cv2

    if scale <= 0.0:
        raise ValueError("Argument scale should be positive")
    interp = {
        "nearest": cv2.INTER_NEAREST,
        "bilinear": cv2.INTER_LINEAR,
        "bicubic": cv2.INTER_CUBIC,
        "area": cv2.INTER_AREA,
    }[interpolation]
    border = {
        "constant": cv2.BORDER_CONSTANT,
        "replicate": cv2.BORDER_REPLICATE,
        "reflect": cv2.BORDER_REFLECT,
        "reflect101": cv2.BORDER_REFLECT_101,
    }[mode]
    h, w = img.shape[:2]
    center = (w * 0.5 + 0.5, h * 0.5 + 0.5)
    matrix = _get_affine_matrix(center, angle, translate, scale, shear)
    out = cv2.warpAffine(
        img, matrix, (w, h), flags=interp, borderMode=border,
        borderValue=fillcolor,
    )
    if img.ndim == 3 and img.shape[2] == 1:
        return out[:, :, np.newaxis]
    return out


def to_grayscale(img: np.ndarray, num_output_channels: int = 1) -> np.ndarray:
    """RGB → grayscale, 1 or 3 output channels (functional.py:580-598)."""
    import cv2

    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[:, :, np.newaxis]
    if num_output_channels == 3:
        return np.broadcast_to(gray, img.shape)
    if num_output_channels != 1:
        raise ValueError("num_output_channels should be either 1 or 3")
    return gray


# ---------------------------------------------------------------------------
# class API (reference dataset/opencv_transforms/transforms.py): composable
# transform objects over the functional surface above
# ---------------------------------------------------------------------------


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class Lambda:
    def __init__(self, lambd):
        self.lambd = lambd

    def __call__(self, img):
        return self.lambd(img)


class ToTensor:
    def __call__(self, pic):
        return to_tensor(pic)


class Normalize:
    def __init__(self, mean, std):
        self.mean, self.std = mean, std

    def __call__(self, img):
        return normalize(img, self.mean, self.std)


class Resize:
    def __init__(self, size, interpolation: str = "bilinear"):
        self.size, self.interpolation = size, interpolation

    def __call__(self, img):
        return resize(img, self.size, self.interpolation)


class CenterCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        return center_crop(img, self.size)


class Pad:
    def __init__(self, padding, fill=0, padding_mode: str = "constant"):
        self.padding, self.fill, self.padding_mode = padding, fill, padding_mode

    def __call__(self, img):
        return pad(img, self.padding, self.fill, self.padding_mode)


class RandomCrop:
    def __init__(self, size, padding=0, rng: "np.random.Generator" = None):
        self.size = _size_pair(size)
        self.padding = padding
        self.rng = rng or np.random.default_rng()

    def __call__(self, img):
        if self.padding:
            img = pad(img, self.padding)
        h, w = img.shape[:2]
        th, tw = self.size
        i = int(self.rng.integers(0, h - th + 1))
        j = int(self.rng.integers(0, w - tw + 1))
        return crop(img, i, j, th, tw)


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5, rng=None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, img):
        return hflip(img) if self.rng.random() < self.p else img


class RandomVerticalFlip:
    def __init__(self, p: float = 0.5, rng=None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, img):
        return vflip(img) if self.rng.random() < self.p else img


class RandomResizedCrop:
    def __init__(self, size, scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                 interpolation: str = "bilinear", rng=None):
        self.size = _size_pair(size)
        self.scale, self.ratio = scale, ratio
        self.interpolation = interpolation
        self.rng = rng or np.random.default_rng()

    def get_params(self, img):
        import math

        h, w = img.shape[:2]
        area = h * w
        for _ in range(10):
            target = area * self.rng.uniform(*self.scale)
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            ar = math.exp(self.rng.uniform(*log_ratio))
            tw = int(round(math.sqrt(target * ar)))
            th = int(round(math.sqrt(target / ar)))
            if 0 < tw <= w and 0 < th <= h:
                i = int(self.rng.integers(0, h - th + 1))
                j = int(self.rng.integers(0, w - tw + 1))
                return i, j, th, tw
        # fallback: center crop
        th = tw = min(h, w)
        return (h - th) // 2, (w - tw) // 2, th, tw

    def __call__(self, img):
        i, j, th, tw = self.get_params(img)
        return resized_crop(img, i, j, th, tw, self.size, self.interpolation)


class FiveCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        return five_crop(img, self.size)


class TenCrop:
    def __init__(self, size, vertical_flip: bool = False):
        self.size, self.vertical_flip = size, vertical_flip

    def __call__(self, img):
        return ten_crop(img, self.size, self.vertical_flip)


class Grayscale:
    def __init__(self, num_output_channels: int = 1):
        self.num_output_channels = num_output_channels

    def __call__(self, img):
        return to_grayscale(img, self.num_output_channels)


class RandomRotation:
    def __init__(self, degrees, rng=None):
        if isinstance(degrees, numbers.Number):
            degrees = (-degrees, degrees)
        self.degrees = degrees
        self.rng = rng or np.random.default_rng()

    def __call__(self, img):
        angle = self.rng.uniform(*self.degrees)
        return rotate(img, angle)


class RandomAffine:
    def __init__(self, degrees, translate=None, scale=None, shear=None,
                 rng=None):
        if isinstance(degrees, numbers.Number):
            degrees = (-degrees, degrees)
        self.degrees, self.translate = degrees, translate
        self.scale_range, self.shear = scale, shear
        self.rng = rng or np.random.default_rng()

    def __call__(self, img):
        angle = self.rng.uniform(*self.degrees)
        h, w = img.shape[:2]
        if self.translate is not None:
            tx = self.rng.uniform(-self.translate[0], self.translate[0]) * w
            ty = self.rng.uniform(-self.translate[1], self.translate[1]) * h
            translate = (int(round(tx)), int(round(ty)))
        else:
            translate = (0, 0)
        scale = self.rng.uniform(*self.scale_range) if self.scale_range else 1.0
        if self.shear is not None:
            shear_range = (
                (-self.shear, self.shear)
                if isinstance(self.shear, numbers.Number) else self.shear
            )
            shear = self.rng.uniform(*shear_range)
        else:
            shear = 0.0
        return affine(img, angle, translate, scale, shear)


class ColorJitter:
    """brightness/contrast/saturation/hue jitter (transforms.py ColorJitter)."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0, rng=None):
        self.brightness, self.contrast = brightness, contrast
        self.saturation, self.hue = saturation, hue
        self.rng = rng or np.random.default_rng()

    def __call__(self, img):
        ops = []
        if self.brightness > 0:
            f = self.rng.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im: adjust_brightness(im, f))
        if self.contrast > 0:
            f = self.rng.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im: adjust_contrast(im, f))
        if self.saturation > 0:
            f = self.rng.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im: adjust_saturation(im, f))
        if self.hue > 0:
            f = self.rng.uniform(-self.hue, self.hue)
            ops.append(lambda im: adjust_hue(im, f))
        self.rng.shuffle(ops)
        for op in ops:
            img = op(img)
        return img
