"""Data layer: kernel synthesis, cyclic band-window sampling, degradation
semantics (white background, clean frame 0), loader batching."""

import os

import numpy as np
import pytest

from hi3d_tpu.data.degradation import DegradedImages
from hi3d_tpu.data.kernels import (
    DEFAULT_DEGRADATION_OPT,
    bivariate_gaussian,
    circular_lowpass_kernel,
    pulse_kernel,
    random_mixed_kernels,
    sample_frame_kernels,
)
from hi3d_tpu.data.video_dataset import (
    PrefetchLoader,
    TarShardVideoDataset,
    TarShardVideoDatasetStage2,
    VideoTrainDataset,
    VideoTrainDatasetStage2,
    pack_folder_to_shards,
    prepare_eval_input,
)


# ------------------------------------------------------------------ kernels
def test_kernels_normalized():
    rng = np.random.RandomState(0)
    for _ in range(10):
        k = random_mixed_kernels(
            DEFAULT_DEGRADATION_OPT["kernel_list"],
            DEFAULT_DEGRADATION_OPT["kernel_prob"],
            13, (0.2, 3.0), (0.2, 3.0), rng=rng,
        )
        assert k.shape == (13, 13)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    s = circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert s.shape == (21, 21)
    np.testing.assert_allclose(s.sum(), 1.0, rtol=1e-6)


def test_gaussian_kernel_isotropy():
    k = bivariate_gaussian(11, 1.5, isotropic=True)
    np.testing.assert_allclose(k, k.T, rtol=1e-6)
    assert k[5, 5] == k.max()


def test_sample_frame_kernels_shapes():
    k1, k2, ks = sample_frame_kernels(
        DEFAULT_DEGRADATION_OPT, 4, np.random.RandomState(0)
    )
    for k in (k1, k2, ks):
        assert k.shape == (4, 21, 21)
        np.testing.assert_allclose(k.sum(axis=(1, 2)), 1.0, rtol=1e-5)


# ------------------------------------------------------------------ dataset
@pytest.fixture(scope="module")
def render_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("renders")
    rng = np.random.RandomState(0)
    for obj in ["obj_a", "obj_b"]:
        d = root / obj
        d.mkdir()
        for i in range(96):
            rgba = rng.randint(0, 255, (24, 24, 4), np.uint8)
            rgba[..., 3] = 255 * (rgba[..., 0] > 40)
            cv2.imwrite(str(d / f"{i:03d}.png"), rgba)
    return str(root)


def test_stage1_sampling(render_dir):
    ds = VideoTrainDataset(render_dir, width=16, height=16, sample_frames=16)
    rng = np.random.RandomState(3)
    seen_elevations = set()
    for _ in range(20):
        s = ds.sample(rng)
        assert s["video"].shape == (16, 16, 16, 3)
        assert s["video"].min() >= -1.0 and s["video"].max() <= 1.0
        assert int(s["fps_id"]) == 7 and int(s["motion_bucket_id"]) == 127
        seen_elevations.add(float(s["elevation"]))
    assert seen_elevations <= {-10.0, 0.0, 10.0, 20.0, 30.0, 40.0}
    assert len(seen_elevations) >= 2  # random starts hit several bands


def test_cyclic_window_within_band():
    ds = VideoTrainDataset.__new__(VideoTrainDataset)
    ds.sample_frames = 16
    frames = [f"{i:03d}" for i in range(96)]

    class FixedRng:
        def __init__(self, v):
            self.v = v

        def randint(self, n):
            return self.v

    sel, elev = ds._select_window(frames, FixedRng(37))  # band 2 (frames 32-47)
    assert elev == 10
    assert sel == [f"{i:03d}" for i in range(37, 48)] + [
        f"{i:03d}" for i in range(32, 37)
    ]


def test_stage2_sample_has_masks_and_kernels(render_dir):
    ds = VideoTrainDatasetStage2(render_dir, width=16, height=16, sample_frames=4)
    s = ds.sample(np.random.RandomState(0))
    assert s["masks"].shape == (4, 16, 16)
    assert set(np.unique(s["masks"])) <= {0.0, 1.0}
    assert s["kernel1s"].shape == (4, 21, 21)
    assert s["sinc_kernels"].shape == (4, 21, 21)


def test_prefetch_loader_batches(render_dir):
    ds = VideoTrainDataset(render_dir, width=16, height=16, sample_frames=4)
    it = iter(PrefetchLoader(ds, batch_size=2, seed=0, num_workers=2))
    batch = next(it)
    assert batch["video"].shape == (2, 4, 16, 16, 3)
    assert batch["elevation"].shape == (2,)
    assert isinstance(batch["caption"], list) and len(batch["caption"]) == 2


@pytest.fixture(scope="module")
def shard_dir(render_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("shards")
    paths = pack_folder_to_shards(render_dir, str(out), objects_per_shard=1)
    assert len(paths) == 2  # 2 objects, 1 per shard
    return str(out)


def test_tar_shard_streaming_matches_folder_semantics(render_dir, shard_dir):
    """Same object + same window → identical frames from tar and folder
    (decode, white composite, resize are shared code)."""
    ds_tar = TarShardVideoDataset(
        os.path.join(shard_dir, "*.tar"), width=16, height=16,
        sample_frames=16, seed=0, shuffle_shards=False,
        process_index=0, process_count=1,
    )
    rng = np.random.RandomState(3)
    seen_elev = set()
    for _ in range(6):
        s = ds_tar.sample(rng)
        assert s["video"].shape == (16, 16, 16, 3)
        assert -1.0 <= s["video"].min() and s["video"].max() <= 1.0
        seen_elev.add(float(s["elevation"]))
        assert int(s["fps_id"]) == 7
    assert seen_elev <= {-10.0, 0.0, 10.0, 20.0, 30.0, 40.0}

    # frame-level equality vs the folder dataset on a pinned window
    class FixedRng:
        def __init__(self, v):
            self.v = v

        def randint(self, n):
            return self.v

    ds_folder = VideoTrainDataset(render_dir, 16, 16, sample_frames=4)
    ds_tar2 = TarShardVideoDataset(
        os.path.join(shard_dir, "*.tar"), width=16, height=16,
        sample_frames=4, shuffle_shards=False, process_index=0,
        process_count=1,
    )
    s_tar = ds_tar2.sample(FixedRng(5))  # first streamed object = obj_a
    # force the folder dataset's cv2 fallback: the native C++ loader's
    # resize differs from cv2 at the last ulp-ish level; the tar path is cv2
    from hi3d_tpu.data import native_loader
    import unittest.mock as mock

    with mock.patch.object(native_loader, "available", lambda: False):
        v_folder, _, elev, _ = ds_folder._load_clip("obj_a", FixedRng(5))
    np.testing.assert_array_equal(s_tar["video"], v_folder)
    assert float(s_tar["elevation"]) == elev


def test_tar_shard_per_host_partition(shard_dir):
    """Two hosts see disjoint shard sets (DistributedSampler parity)."""
    tars = sorted(os.listdir(shard_dir))
    ds0 = TarShardVideoDataset(
        os.path.join(shard_dir, "*.tar"), 16, 16, 4,
        shuffle_shards=False, process_index=0, process_count=2,
    )
    ds1 = TarShardVideoDataset(
        os.path.join(shard_dir, "*.tar"), 16, 16, 4,
        shuffle_shards=False, process_index=1, process_count=2,
    )
    assert ds0._host_shards(0) != ds1._host_shards(0)
    assert set(os.path.basename(p) for p in ds0._host_shards(0) + ds1._host_shards(0)) == set(tars)
    # objects from different hosts are distinct
    o0 = ds0.sample(np.random.RandomState(0))["caption"].split("_0")[0]
    o1 = ds1.sample(np.random.RandomState(0))["caption"].split("_0")[0]
    assert o0 != o1


def test_tar_shard_stage2_and_prefetch(shard_dir):
    ds = TarShardVideoDatasetStage2(
        os.path.join(shard_dir, "*.tar"), 16, 16, 4,
        process_index=0, process_count=1,
    )
    batch = next(iter(PrefetchLoader(ds, batch_size=2, seed=0, num_workers=2)))
    assert batch["video"].shape == (2, 4, 16, 16, 3)
    assert batch["masks"].shape == (2, 4, 16, 16)
    assert batch["kernel1s"].shape == (2, 4, 21, 21)


def test_eval_input_white_background(tmp_path):
    import cv2

    rgba = np.zeros((40, 30, 4), np.uint8)
    rgba[10:30, 8:22, :3] = 128
    rgba[10:30, 8:22, 3] = 255
    p = str(tmp_path / "eval.png")
    cv2.imwrite(p, rgba)
    out = prepare_eval_input(p, elevation=30.0, crop_size=20, image_size=64)
    img = out["input_image"]
    assert img.shape == (64, 64, 3)
    assert img[0, 0, 0] == pytest.approx(1.0)  # white background corner
    assert float(out["input_elevation"]) == pytest.approx(np.deg2rad(30.0))


# -------------------------------------------------------------- degradation
def test_degradation_semantics():
    rng = np.random.RandomState(0)
    t, h, w = 3, 32, 32
    video = rng.rand(1, t, h, w, 3).astype(np.float32) * 2.0 - 1.0
    masks = np.ones((1, t, h, w), np.float32)
    masks[:, :, :8] = 0.0  # top rows are background

    deg = DegradedImages()
    out = deg(video, masks, rng=np.random.RandomState(1))
    assert out.shape == video.shape
    assert out.min() >= -1.0 and out.max() <= 1.0
    # frame 0 stays clean
    np.testing.assert_allclose(out[0, 0], video[0, 0])
    # background is forced to white on degraded frames
    np.testing.assert_allclose(out[0, 1, :8], 1.0)
    # degraded foreground differs from the clean input
    assert float(np.abs(out[0, 1, 8:] - video[0, 1, 8:]).mean()) > 1e-3
