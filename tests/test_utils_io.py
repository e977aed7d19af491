"""Video/image utils: tensor2vid denorm, mp4 round-trip, preprocessing."""

import numpy as np
import pytest

from hi3d_tpu.utils.image import (
    center_crop,
    composite_white,
    foreground_mask_from_white,
    load_image_rgb,
    resize_center_crop,
    to_tensor_range,
)
from hi3d_tpu.utils.video import export_to_video, import_video, tensor2vid


def test_tensor2vid_denorm_and_clip():
    vid = np.zeros((2, 4, 4, 3), np.float32)
    vid[0] = -1.0  # → 0
    vid[1] = 2.0   # → clipped to 255
    frames = tensor2vid(vid)
    assert len(frames) == 2
    assert frames[0].dtype == np.uint8
    assert frames[0].max() == 0 and frames[1].min() == 255
    # 5-D input takes the first batch entry
    frames5 = tensor2vid(vid[None])
    assert len(frames5) == 2


def test_mp4_roundtrip_pads_to_fps(tmp_path):
    frames = [np.full((16, 16, 3), i * 40, np.uint8) for i in range(5)]
    path = export_to_video(frames, str(tmp_path / "v.mp4"), fps=4)
    back = import_video(path)
    assert len(back) == 8  # padded 5 → 8 (multiple of fps)
    assert back[0].shape == (16, 16, 3)


def test_composite_white():
    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[0, 0] = [100, 50, 25, 255]   # opaque
    rgba[1, 1] = [100, 50, 25, 0]     # transparent → white
    out = composite_white(rgba)
    np.testing.assert_array_equal(out[0, 0], [100, 50, 25])
    np.testing.assert_array_equal(out[1, 1], [255, 255, 255])


def test_resize_center_crop_semantics():
    img = np.zeros((100, 60, 3), np.uint8)
    out = resize_center_crop(img, (48, 48))
    assert out.shape == (48, 48, 3)
    # short side scales to cover the target (rate = max of ratios)
    out2 = resize_center_crop(np.zeros((30, 90, 3), np.uint8), (60, 60))
    assert out2.shape == (60, 60, 3)


def test_to_tensor_range():
    img = np.array([[[0, 128, 255]]], np.uint8)
    out = to_tensor_range(img)
    np.testing.assert_allclose(out[0, 0], [-1.0, 0.00392157, 1.0], atol=1e-5)


def test_foreground_mask_threshold_matches_reference():
    # reference: background iff ALL channels > 220 (pipeline_i2v_eval_v02.py:61)
    img = np.array(
        [[[221, 221, 221], [221, 221, 220], [255, 255, 255], [0, 0, 0]]],
        np.uint8,
    )
    mask = foreground_mask_from_white(img)
    np.testing.assert_array_equal(mask[0], [0.0, 1.0, 0.0, 1.0])


def test_load_image_rgb_rgba_composites(tmp_path):
    import cv2

    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[:4, :, :3] = [200, 10, 30]
    rgba[:4, :, 3] = 255
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, rgba[..., [2, 1, 0, 3]])
    img = load_image_rgb(p)
    np.testing.assert_array_equal(img[0, 0], [200, 10, 30])
    np.testing.assert_array_equal(img[7, 7], [255, 255, 255])
