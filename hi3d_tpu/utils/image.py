"""Host-side image preprocessing for the inference CLIs.

Functional parity targets:
- resize-shorter-side + center-crop + BGR→RGB + [-1,1] normalization:
  reference pipeline_i2v_eval_v01.py:134-146 (uses cv2 +
  dataset/opencv_transforms center_crop/to_tensor).
- RGBA → white-background compositing: pipeline_i2v_eval_v01.py:160-168.
- background removal (rembg/U2Net): pipeline_i2v_eval_v01.py:153-156 —
  optional here (the package is not bundled); when unavailable the input is
  assumed to already have a clean/white background.
- alpha-based foreground masks: pipeline_i2v_eval_v02.py:52-70 reimplemented
  vectorized (the reference loops over pixels in Python).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def center_crop(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    th, tw = size
    h, w = img.shape[:2]
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    return img[i : i + th, j : j + tw]


def load_image_rgb(path: str) -> np.ndarray:
    """uint8 HWC RGB."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = composite_white(img[..., [2, 1, 0, 3]])  # BGRA → RGBA → white bg
        return img
    return img[..., ::-1].copy()  # BGR → RGB


def composite_white(rgba: np.ndarray) -> np.ndarray:
    """RGBA uint8 → RGB uint8 on a white background."""
    rgb = rgba[..., :3].astype(np.float32)
    a = rgba[..., 3:4].astype(np.float32) / 255.0
    out = rgb * a + 255.0 * (1.0 - a)
    return out.round().astype(np.uint8)


def resize_center_crop(img: np.ndarray, resolution: Tuple[int, int]) -> np.ndarray:
    """Resize so the target fits, then center crop (reference :137-141)."""
    import cv2

    h, w = img.shape[:2]
    rate = max(resolution[0] / h, resolution[1] / w)
    img = cv2.resize(img, (math.ceil(w * rate), math.ceil(h * rate)))
    return center_crop(img, resolution)


def to_tensor_range(img: np.ndarray) -> np.ndarray:
    """uint8 HWC → float32 HWC in [-1, 1]."""
    return (img.astype(np.float32) / 255.0 - 0.5) * 2.0


def _u2net_checkpoint() -> Optional[str]:
    """Locate a U²-Net checkpoint: $HI3D_U2NET_CKPT or ckpts/u2net[p].pth."""
    import os

    cand = [os.environ.get("HI3D_U2NET_CKPT", "")]
    cand += [os.path.join("ckpts", n) for n in ("u2net.pth", "u2netp.pth")]
    for c in cand:
        if c and os.path.exists(c):
            return c
    return None


def _write_rgba_outputs(rgb: np.ndarray, alpha: np.ndarray,
                        out_rgba: str, out_white: str) -> str:
    import cv2

    a = np.clip(alpha * 255.0, 0, 255).round().astype(np.uint8)
    rgba = np.concatenate([rgb, a[..., None]], axis=-1)
    cv2.imwrite(out_rgba, rgba[..., [2, 1, 0, 3]])  # RGBA → BGRA
    white = composite_white(rgba)
    cv2.imwrite(out_white, white[..., ::-1])
    return out_white


def remove_background(path: str, out_rgba: str, out_white: str) -> str:
    """U²-Net background removal (reference pipeline_i2v_eval_v01.py:153-168).

    Prefers the native JAX U²-Net (models/u2net.py) with weights from
    $HI3D_U2NET_CKPT or ckpts/u2net[p].pth; falls back to the `rembg`
    package if installed; otherwise assumes the input already has a
    clean/white background. Returns the path of the white-background image
    to feed the pipeline.
    """
    ckpt = _u2net_checkpoint()
    if ckpt is not None:
        import cv2

        from hi3d_tpu.convert.torch_to_jax import load_u2net
        from hi3d_tpu.models.u2net import U2Net, segment

        params = load_u2net(ckpt)
        full = "u2netp" not in ckpt.rsplit("/", 1)[-1]
        model = U2Net(full=full)
        img = load_image_rgb(path)  # RGBA composited to white, missing → raise
        mask = np.asarray(segment(model, params, img))
        return _write_rgba_outputs(img, mask, out_rgba, out_white)

    try:
        import rembg
        from PIL import Image

        session = rembg.new_session()
        image = Image.open(path)
        image = rembg.remove(image, session=session)
        image.save(out_rgba)
        white = Image.new("RGB", image.size, "WHITE")
        white.paste(image, mask=image.split()[3])
        white.save(out_white)
        return out_white
    except ImportError:
        return path


def foreground_mask_from_white(
    img: np.ndarray, threshold: int = 220
) -> np.ndarray:
    """Float foreground mask: 0 where all channels exceed the threshold
    (near-white background), 1 elsewhere.

    Vectorized reimplementation of the reference's per-pixel Python loop
    (pipeline_i2v_eval_v02.py:52-70, threshold 220).
    """
    bg = np.all(img.astype(np.int32) > threshold, axis=-1)
    return (~bg).astype(np.float32)


def log_txt_as_img(
    wh: Tuple[int, int], captions, size: int = 10
) -> np.ndarray:
    """Render captions as white images with black text (reference
    sgm/util.py:68-95) for the image logger's conditioning dumps.

    Returns (B, H, W, 3) float32 in [-1, 1]. Uses PIL's bundled default
    font (the reference hardcodes a DejaVuSans.ttf path that may not
    exist; behavior is otherwise identical — 40·(W/256) chars per line).
    """
    from PIL import Image, ImageDraw, ImageFont

    out = []
    for cap in captions:
        txt = Image.new("RGB", wh, color="white")
        draw = ImageDraw.Draw(txt)
        try:
            font = ImageFont.truetype("DejaVuSans.ttf", size=size)
        except OSError:
            try:
                font = ImageFont.load_default(size=size)
            except TypeError:  # older PIL: no size kwarg
                font = ImageFont.load_default()
        if isinstance(cap, (list, tuple)):
            cap = cap[0]
        cap = str(cap)
        nc = max(int(40 * (wh[0] / 256)), 1)
        lines = "\n".join(cap[i : i + nc] for i in range(0, len(cap), nc))
        try:
            draw.text((0, 0), lines, fill="black", font=font)
        except UnicodeEncodeError:
            pass
        out.append(np.asarray(txt, np.float32) / 127.5 - 1.0)
    return np.stack(out)
