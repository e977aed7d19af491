"""Native C++ clip loader: builds, decodes PNG/JPEG, matches the cv2 path."""

import os

import numpy as np
import pytest

from hi3d_tpu.data import native_loader


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    rgba = rng.randint(0, 255, (48, 40, 4), np.uint8)
    rgba[..., 3] = np.where(rgba[..., 0] > 100, 255, 0)
    png_path = str(d / "a.png")
    cv2.imwrite(png_path, rgba[..., [2, 1, 0, 3]])  # RGBA → BGRA for cv2

    rgb = rng.randint(0, 255, (32, 32, 3), np.uint8)
    jpg_path = str(d / "b.jpg")
    cv2.imwrite(jpg_path, rgb[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 95])
    return png_path, jpg_path, rgba, rgb


def test_native_loader_builds():
    assert native_loader.available(), "native loader must build in this image"


def test_png_matches_python_path(images):
    png_path, _, rgba, _ = images
    video, masks = native_loader.load_clip([png_path], 48, 40)
    assert video.shape == (1, 48, 40, 3)
    # same-size load → no resampling: compare against the exact composite
    a = rgba[..., 3:].astype(np.float32) / 255.0
    ref = rgba[..., :3].astype(np.float32) * a + 255.0 * (1.0 - a)
    ref = ref / 127.5 - 1.0
    np.testing.assert_allclose(video[0], ref, atol=2e-2)
    np.testing.assert_array_equal(masks[0], (rgba[..., 3] > 127).astype(np.float32))


def test_jpeg_decodes_exactly_like_cv2(images):
    import cv2

    _, jpg_path, _, _ = images
    video, masks = native_loader.load_clip([jpg_path], 32, 32)
    ref = cv2.imread(jpg_path)[..., ::-1].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(video[0], ref, atol=1e-6)
    np.testing.assert_array_equal(masks[0], 1.0)  # opaque


def test_resize_close_to_cv2(images):
    import cv2

    _, jpg_path, _, _ = images  # fully opaque → compositing order irrelevant
    video, _ = native_loader.load_clip([jpg_path], 24, 20)
    comp = cv2.imread(jpg_path)[..., ::-1]
    ref = cv2.resize(comp, (20, 24), interpolation=cv2.INTER_LINEAR)
    ref = ref.astype(np.float32) / 127.5 - 1.0
    assert float(np.abs(video[0] - ref).mean()) < 0.02


def test_missing_file_raises():
    with pytest.raises(RuntimeError):
        native_loader.load_clip(["/nonexistent/x.png"], 8, 8)


def test_multi_frame_threading(images):
    png_path, jpg_path, _, _ = images
    paths = [png_path, jpg_path] * 8
    video, masks = native_loader.load_clip(paths, 16, 16, num_threads=4)
    assert video.shape == (16, 16, 16, 3)
    assert np.all(np.isfinite(video))
    # frame order is preserved despite the thread pool
    np.testing.assert_allclose(video[0], video[2], atol=1e-6)
    np.testing.assert_allclose(video[1], video[3], atol=1e-6)
