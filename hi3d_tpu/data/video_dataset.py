"""Objaverse orbital-render datasets + prefetching loader.

Functional parity targets (reference file:line):
- VideoTrainDataset (stage 1): sgm/data/video_dataset.py:53-140 — folder of
  96 rendered frames = 6 elevation bands [-10,0,10,20,30,40] × 16 azimuths;
  a random start frame selects its band's elevation and a cyclic 16-frame
  window *within the band* (:101-110); RGBA → white-background composite
  (:73-79); values in [-1,1]; batch keys {video, elevation, caption,
  fps_id: 7, motion_bucket_id: 127} (:140).
- VideoTrainDatasetStage2: video_dataset_stage2_degradeImages.py:58-251 —
  same sampling + per-frame alpha masks + per-frame 21×21 degradation
  kernels generated on the CPU (:184-251).
- SyncDreamerEvalData: video_dataset.py:25-50,142-163 — eval PNGs,
  alpha-crop + margin-pad + white background at 512².
- VideoDataset (LightningDataModule): video_dataset.py:165-191 — here a
  plain object with train/val iterators; DistributedSampler parity comes
  from per-process seeding (jax.process_index), and `prefetch` threads
  overlap host decode/degradation with TPU steps.

Layout: channels-last (T, H, W, 3) per sample, batched to (B, T, H, W, 3).
"""

from __future__ import annotations

import os
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

ELEVATION_BANDS = (-10, 0, 10, 20, 30, 40)
BAND = 16


def _rgba_white(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Decoded BGR(A) image → (white-composited RGB uint8, alpha HW1)."""
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[-1] == 4:
        rgba = img[..., [2, 1, 0, 3]].astype(np.float32) / 255.0
        mask = rgba[..., 3:]
        rgb = rgba[..., :3] * mask + 1.0 - mask
        return (rgb * 255.0).astype(np.uint8), mask.astype(np.float32)
    return img[..., ::-1].copy(), np.ones(img.shape[:2] + (1,), np.float32)


def load_rgba_white(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """PNG → (white-composited RGB uint8, alpha mask float32 HW1)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    return _rgba_white(img)


def rgba_white_from_bytes(buf: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """Encoded PNG/JPEG bytes → (white-composited RGB uint8, alpha HW1)."""
    import cv2

    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError("undecodable image bytes")
    return _rgba_white(img)


def select_window(
    frames: List, rng, sample_frames: int
) -> Tuple[List, int]:
    """Cyclic window inside the elevation band of a random start frame
    (reference sgm/data/video_dataset.py:101-110)."""
    start = int(rng.randint(len(frames)))
    band_id = start // BAND
    elevation = ELEVATION_BANDS[min(band_id, len(ELEVATION_BANDS) - 1)]
    lo, hi = band_id * BAND, (band_id + 1) * BAND
    selected = [frames[i] for i in range(start, hi)] + [
        frames[i] for i in range(lo, start)
    ]
    return selected[:sample_frames], elevation


class VideoTrainDataset:
    """Stage-1 training samples from folder-of-frames orbital renders."""

    def __init__(
        self,
        base_folder: str,
        width: int = 512,
        height: int = 512,
        sample_frames: int = 16,
    ):
        self.base_folder = base_folder
        self.folders = sorted(os.listdir(base_folder))
        if not self.folders:
            raise ValueError(f"no render folders under {base_folder}")
        self.width = int(width)
        self.height = int(height)
        self.sample_frames = int(sample_frames)

    def __len__(self) -> int:
        return len(self.folders)

    def _select_window(self, frames: List[str], rng) -> Tuple[List[str], int]:
        return select_window(frames, rng, self.sample_frames)

    def _load_clip(self, folder: str, rng):
        folder_path = os.path.join(self.base_folder, folder)
        frames = sorted(os.listdir(folder_path))
        if len(frames) < self.sample_frames:
            raise ValueError(
                f"folder {folder!r} has {len(frames)} < {self.sample_frames} frames"
            )
        selected, elevation = self._select_window(frames, rng)
        paths = [os.path.join(folder_path, n) for n in selected]

        # native C++ decode/composite/resize core (threads, no GIL);
        # cv2 fallback keeps behavior identical when the toolchain is absent
        from . import native_loader

        if native_loader.available():
            try:
                video, masks = native_loader.load_clip(
                    paths, self.height, self.width
                )
                return video, masks, elevation, selected[0]
            except RuntimeError:
                pass

        import cv2

        video, masks = [], []
        for path in paths:
            rgb, mask = load_rgba_white(path)
            rgb = cv2.resize(rgb, (self.width, self.height))
            mask = cv2.resize(mask, (self.width, self.height))
            video.append(rgb.astype(np.float32) / 127.5 - 1.0)
            masks.append((mask > 0.5).astype(np.float32))
        return np.stack(video), np.stack(masks), elevation, selected[0]

    def sample(self, rng: np.random.RandomState) -> Dict:
        folder = self.folders[int(rng.randint(len(self.folders)))]
        video, _, elevation, first = self._load_clip(folder, rng)
        return {
            "video": video,  # (T, H, W, 3) in [-1, 1]
            "elevation": np.float32(elevation),
            "caption": f"{folder}_{first}",
            "fps_id": np.int32(7),
            "motion_bucket_id": np.int32(127),
        }

    def __getitem__(self, idx: int) -> Dict:
        return self.sample(np.random.RandomState(idx))


class VideoTrainDatasetStage2(VideoTrainDataset):
    """Adds per-frame masks + degradation kernels (stage-2 refiner)."""

    def __init__(self, *args, degradation_opt: Optional[dict] = None, **kwargs):
        # depth_folder accepted for config parity; depth is computed by the
        # DepthEmbedder at train time, not read from disk
        kwargs.pop("depth_folder", None)
        super().__init__(*args, **kwargs)
        from .kernels import DEFAULT_DEGRADATION_OPT

        self.opt = dict(DEFAULT_DEGRADATION_OPT, **(degradation_opt or {}))

    def sample(self, rng: np.random.RandomState) -> Dict:
        from .kernels import sample_frame_kernels

        folder = self.folders[int(rng.randint(len(self.folders)))]
        video, masks, elevation, _ = self._load_clip(folder, rng)
        k1, k2, ks = sample_frame_kernels(self.opt, self.sample_frames, rng)
        return {
            "video": video,
            "masks": masks,  # (T, H, W)
            "elevation": np.float32(elevation),
            "caption": folder,
            "kernel1s": k1,
            "kernel2s": k2,
            "sinc_kernels": ks,
        }


class TarShardVideoDataset:
    """Streaming tar-shard ingestion (webdataset-style) for orbital renders.

    The reference streams its loader through `wds.WebLoader` with a
    `DistributedSampler` (sgm/data/video_dataset.py:182-184); this is the
    TPU-native form of that data surface: shards are plain `.tar` files whose
    members are `<object>/<frame>.png` with each object's 96 frames
    contiguous (the webdataset contract, exactly what
    `pack_folder_to_shards` writes). Shards are

    - partitioned per host: `shards[process_index::process_count]`
      (DistributedSampler parity — every host sees a disjoint shard set),
    - reshuffled every epoch with the shared seed, and
    - read strictly sequentially (`tarfile` stream mode) — no random access,
      so the same code path saturates local disk, NFS, or a FUSE-mounted
      object store.

    Sampling semantics per object are identical to VideoTrainDataset
    (cyclic band window, white-bg composite, [-1,1]); `sample(rng)` is
    thread-safe so PrefetchLoader can drive it with its worker pool.
    """

    stage2 = False

    def __init__(
        self,
        shards,  # glob pattern or explicit list of .tar paths
        width: int = 512,
        height: int = 512,
        sample_frames: int = 16,
        seed: int = 0,
        shuffle_shards: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        degradation_opt: Optional[dict] = None,
    ):
        import glob as globlib

        if isinstance(shards, str):
            self.shards = sorted(globlib.glob(shards))
        else:
            self.shards = sorted(shards)
        if not self.shards:
            raise ValueError(f"no tar shards match {shards!r}")
        self.width, self.height = int(width), int(height)
        self.sample_frames = int(sample_frames)
        self.seed = seed
        self.shuffle_shards = shuffle_shards
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index, self.process_count = process_index, process_count
        self._lock = threading.Lock()
        self._it = self._objects()
        if self.stage2:
            from .kernels import DEFAULT_DEGRADATION_OPT

            self.opt = dict(DEFAULT_DEGRADATION_OPT, **(degradation_opt or {}))

    def _host_shards(self, epoch: int) -> List[str]:
        order = list(self.shards)
        if self.shuffle_shards:
            perm = np.random.RandomState(self.seed + epoch).permutation(
                len(order)
            )
            order = [order[i] for i in perm]
        mine = order[self.process_index :: self.process_count]
        # degenerate case: fewer shards than hosts — fall back to all shards
        # (duplicated work beats a starved host; log once)
        if not mine:
            mine = order
        return mine

    def _objects(self) -> Iterator[Tuple[str, Dict[str, bytes]]]:
        """Infinite stream of (object_name, {frame_name: png_bytes})."""
        import tarfile

        epoch = 0
        while True:
            for shard in self._host_shards(epoch):
                with tarfile.open(shard, mode="r|*") as tf:  # stream mode
                    cur: Optional[str] = None
                    files: Dict[str, bytes] = {}
                    for member in tf:
                        if not member.isfile():
                            continue
                        obj, _, fname = member.name.partition("/")
                        if obj != cur and files:
                            yield cur, files
                            files = {}
                        cur = obj
                        files[fname] = tf.extractfile(member).read()
                    if files:
                        yield cur, files
            epoch += 1

    def sample(self, rng: np.random.RandomState) -> Dict:
        import cv2

        with self._lock:
            name, files = next(self._it)
        frames = sorted(files)
        if len(frames) < self.sample_frames:
            raise ValueError(
                f"object {name!r} has {len(frames)} < {self.sample_frames} frames"
            )
        selected, elevation = select_window(frames, rng, self.sample_frames)
        video, masks = [], []
        for fname in selected:
            rgb, mask = rgba_white_from_bytes(files[fname])
            rgb = cv2.resize(rgb, (self.width, self.height))
            mask = cv2.resize(mask, (self.width, self.height))
            video.append(rgb.astype(np.float32) / 127.5 - 1.0)
            masks.append((mask > 0.5).astype(np.float32))
        out: Dict = {
            "video": np.stack(video),
            "elevation": np.float32(elevation),
            "caption": f"{name}_{selected[0]}",
            "fps_id": np.int32(7),
            "motion_bucket_id": np.int32(127),
        }
        if self.stage2:
            from .kernels import sample_frame_kernels

            k1, k2, ks = sample_frame_kernels(self.opt, self.sample_frames, rng)
            out.pop("fps_id"), out.pop("motion_bucket_id")
            out["caption"] = name
            out.update(
                masks=np.stack(masks), kernel1s=k1, kernel2s=k2, sinc_kernels=ks
            )
        return out


class TarShardVideoDatasetStage2(TarShardVideoDataset):
    stage2 = True


def pack_folder_to_shards(
    base_folder: str,
    out_dir: str,
    objects_per_shard: int = 64,
    prefix: str = "renders",
) -> List[str]:
    """Pack folder-of-frames renders into webdataset-style tar shards.

    Each shard holds `objects_per_shard` complete objects, members named
    `<object>/<frame>` in sorted frame order (objects contiguous), ready for
    TarShardVideoDataset."""
    import tarfile

    os.makedirs(out_dir, exist_ok=True)
    folders = sorted(os.listdir(base_folder))
    paths: List[str] = []
    for s0 in range(0, len(folders), objects_per_shard):
        shard = os.path.join(
            out_dir, f"{prefix}-{s0 // objects_per_shard:05d}.tar"
        )
        with tarfile.open(shard, "w") as tf:
            for obj in folders[s0 : s0 + objects_per_shard]:
                d = os.path.join(base_folder, obj)
                for frame in sorted(os.listdir(d)):
                    tf.add(os.path.join(d, frame), arcname=f"{obj}/{frame}")
        paths.append(shard)
    return paths


def prepare_eval_input(
    image_path: str, elevation: float = 0.0, crop_size: int = -1,
    image_size: int = 512,
) -> Dict:
    """Reference sgm/data/video_dataset.py:25-50: alpha-crop, margin-pad,
    white background, [-1,1]."""
    from PIL import Image

    image = Image.open(image_path)
    if crop_size != -1 and image.mode == "RGBA":
        alpha = np.asarray(image)[:, :, 3]
        ys, xs = np.nonzero(alpha)
        box = (xs.min(), ys.min(), xs.max(), ys.max())
        ref = image.crop(box)
        scale = crop_size / max(ref.height, ref.width)
        ref = ref.resize(
            (int(scale * ref.width), int(scale * ref.height)), Image.BICUBIC
        )
        canvas = Image.new(ref.mode, (image_size, image_size), 0)
        canvas.paste(
            ref, ((image_size - ref.width) // 2, (image_size - ref.height) // 2)
        )
        image = canvas
    else:
        side = max(image.height, image.width)
        canvas = Image.new(image.mode, (side, side), 0)
        canvas.paste(
            image, ((side - image.width) // 2, (side - image.height) // 2)
        )
        image = canvas.resize((image_size, image_size), Image.BICUBIC)

    arr = np.asarray(image).astype(np.float32) / 255.0
    if arr.shape[-1] == 4:
        mask = arr[:, :, 3:]
        arr = arr[:, :, :3] * mask + 1.0 - mask
    return {
        "input_image": arr * 2.0 - 1.0,
        "input_elevation": np.float32(np.deg2rad(elevation)),
    }


class SyncDreamerEvalData:
    def __init__(self, image_dir: str, image_size: int = 512, crop_size: int = 20):
        self.image_size = image_size
        self.crop_size = crop_size
        self.fns = sorted(
            fn for fn in Path(image_dir).iterdir() if fn.suffix == ".png"
        )

    def __len__(self) -> int:
        return len(self.fns)

    def __getitem__(self, index: int) -> Dict:
        return prepare_eval_input(
            str(self.fns[index]), 0.0, self.image_size, self.image_size
        )


def _collate(samples: List[Dict]) -> Dict:
    out: Dict = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        out[k] = vals if isinstance(vals[0], str) else np.stack(vals)
    return out


class PrefetchLoader:
    """Threaded sample prefetcher yielding batched numpy dicts forever."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.seed = seed
        self.num_workers = max(1, int(num_workers))
        self.prefetch = prefetch

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        stop = threading.Event()

        def worker(wid: int):
            rng = np.random.RandomState(self.seed * 100003 + wid)
            while not stop.is_set():
                try:
                    q.put(self.dataset.sample(rng), timeout=0.5)
                except queue.Full:
                    continue

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            while True:
                yield _collate([q.get() for _ in range(self.batch_size)])
        finally:
            stop.set()


class VideoDataset:
    """Config-facing data module (reference video_dataset.py:165-191).

    Per-process sharding: each JAX process seeds its loader with
    seed + process_index — the TPU analog of DistributedSampler(seed).
    """

    train_cls = VideoTrainDataset
    tar_cls = TarShardVideoDataset

    def __init__(
        self,
        base_folder: str,
        eval_folder: Optional[str] = None,
        width: int = 512,
        height: int = 512,
        sample_frames: int = 16,
        batch_size: int = 1,
        num_workers: int = 4,
        seed: int = 0,
        **kwargs,
    ):
        self.base_folder = base_folder
        self.eval_folder = eval_folder
        self.width, self.height = width, height
        self.sample_frames = sample_frames
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.seed = seed
        self.extra = kwargs
        self.train_dataset = None
        self.val_dataset = None

    def setup(self):
        if ".tar" in str(self.base_folder):
            # streaming tar-shard ingestion (glob or single shard path)
            self.train_dataset = self.tar_cls(
                self.base_folder,
                self.width,
                self.height,
                self.sample_frames,
                seed=self.seed,
                **{
                    k: v
                    for k, v in self.extra.items()
                    if k in ("degradation_opt", "shuffle_shards",
                             "process_index", "process_count")
                },
            )
        else:
            self.train_dataset = self.train_cls(
                self.base_folder, self.width, self.height, self.sample_frames
            )
        if self.eval_folder:
            self.val_dataset = SyncDreamerEvalData(self.eval_folder)
        return self

    def train_dataloader(self) -> Iterator[Dict]:
        import jax

        if self.train_dataset is None:
            self.setup()
        return iter(
            PrefetchLoader(
                self.train_dataset,
                self.batch_size,
                seed=self.seed + jax.process_index(),
                num_workers=self.num_workers,
            )
        )

    def val_dataloader(self):
        if self.val_dataset is None:
            self.setup()
        return self.val_dataset


class VideoDatasetStage2(VideoDataset):
    train_cls = VideoTrainDatasetStage2
    tar_cls = TarShardVideoDatasetStage2
