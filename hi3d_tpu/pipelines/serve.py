"""Batched serving: N concurrent assets sharded over the device mesh.

BASELINE config 5: "Batched serving: 8 concurrent assets on v5e-8 with
sharded UNet denoiser + tiled VAE decode." The reference has no serving mode
(one asset per CLI run); this is the TPU-native scale-out:

- **throughput mode** (B ≥ n_chips): the asset batch is sharded along the
  mesh "data" axis — embarrassingly parallel, zero cross-device
  communication; each chip denoises its local assets' CFG-doubled 16-frame
  batch.
- **latency mode** (B < n_chips): the FRAME axis shards instead (B·T over
  "data"). Spatial attention and convs stay chip-local; only the temporal
  attention's (B·T) → (B·S, T) regroup crosses chips, which XLA lowers to
  all-to-alls over ICI — the single-asset <60 s path on a v5e-8.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel.mesh import batch_sharding, get_mesh
from .i2v import UC_ZERO_KEYS


def _replicate(tree, mesh):
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(lambda v: jax.device_put(v, rep), tree)


def _replicated_params(model, mesh):
    """A mesh-replicated COPY of the model's UNet params (None if unset).

    The engine's one-program compute-dtype cast leaves params committed to
    device 0; jax.jit refuses a call mixing those with mesh-sharded batch
    args ("Received incompatible devices for jitted computation") instead of
    resharding. The servers therefore keep their own replicated copy and
    thread it through `params=` — the model object is NOT mutated, so
    single-device use of the same model elsewhere keeps its placement. On a
    real pod the transfer happens once at construction, not per request."""
    if getattr(model, "params", None) is None:
        return None
    return _replicate(model.params, mesh)


def _replicated_fs_params(model, mesh):
    fs = getattr(model, "first_stage_model", None)
    if fs is None or getattr(fs, "params", None) is None:
        return None
    return _replicate(fs.params, mesh)


def _mesh_put(mesh):
    """Per-array placement: shard the leading axis over "data" when it
    divides, replicate otherwise. Shared by both servers."""
    n = mesh.shape["data"]

    def put(v):
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] % n == 0:
            return jax.device_put(v, batch_sharding(mesh, v.ndim))
        return v

    return put


class OrbitServer:
    """Stage-1 multi-asset orbital-video generation over a mesh."""

    def __init__(self, model, mesh=None):
        self.model = model
        self.mesh = mesh if mesh is not None else get_mesh()
        self._params = _replicated_params(model, self.mesh)
        self._fs_params = _replicated_fs_params(model, self.mesh)

    def _shard(self, tree: Dict) -> Dict:
        return jax.tree.map(_mesh_put(self.mesh), tree)

    def generate(
        self,
        images: np.ndarray,  # (B, H, W, 3) in [-1, 1]
        elevations: Optional[Sequence[float]] = None,
        rng: Optional[jax.Array] = None,
        encoder_reuse: int = 0,  # turbo (approximate; 0 = exact)
        cfg_interval=None,  # (lo, hi): CFG only where σ ∈ [lo, hi] (turbo)
        output_dtype: str = "float32",  # "uint8": denormalize on device
    ) -> np.ndarray:
        """→ (B, T, H, W, 3) in [-1, 1]; B must divide by the mesh data size."""
        model = self.model
        b, h, w, _ = images.shape
        t = model.num_samples
        n = self.mesh.shape["data"]
        if (b * t) % n:
            raise ValueError(
                f"batch×frames {b}·{t} not divisible by data axis {n}"
            )
        if rng is None:
            rng = model.next_rng()
        r_custom, r_sample = jax.random.split(rng)

        video = jnp.repeat(jnp.asarray(images)[:, None], t, axis=1)
        batch: Dict = {
            "video": video,
            "elevation": jnp.asarray(
                elevations if elevations is not None else [0.0] * b,
                jnp.float32,
            ),
        }
        batch = model.add_custom_cond(batch, infer=True, rng=r_custom)
        c, uc = model.conditioner.get_unconditional_conditioning(
            batch, force_uc_zero_embeddings=list(UC_ZERO_KEYS)
        )
        c, uc = self._shard(c), self._shard(uc)

        samples = model.sample(
            cond=c,
            uc=uc,
            shape=(b * t, h // 8, w // 8, 4),
            num_video_frames=t,
            rng=r_sample,
            params=self._params,
            encoder_reuse=encoder_reuse,
            cfg_interval=cfg_interval,
        )
        # fs_params threads the mesh-replicated VAE weights through the call
        # (no shared-state mutation — reentrant; concurrent single-device
        # users of the same model object keep their placement)
        decoded = model.decode_first_stage(samples, fs_params=self._fs_params)
        if output_dtype == "uint8":
            from ..utils.video import denorm_to_uint8

            return np.asarray(denorm_to_uint8(decoded)).reshape(b, t, h, w, 3)
        out = np.asarray(
            jnp.clip(decoded, -1.0, 1.0), dtype=np.float32
        ).reshape(b, t, h, w, 3)
        return out


class RefineServer:
    """Stage-2 multi-asset latent-blending refinement over a mesh.

    Shards the B·T frame axis of the blend loop (v2v.blend_refine_batch)
    across the "data" mesh axis: the α-blend, VAE encode/decode, spatial
    attention, and convs are frame-local; only the UNet's temporal attention
    regroups frames (ICI all-to-all). With B=1, T=16 on a v5e-8 this is the
    single-asset latency path of the <60 s two-stage target."""

    def __init__(self, model, mesh=None):
        self.model = model
        self.mesh = mesh if mesh is not None else get_mesh()
        self._params = _replicated_params(model, self.mesh)
        self._fs_params = _replicated_fs_params(model, self.mesh)

    def refine(
        self,
        videos: np.ndarray,  # (B, T, H, W, 3) in [-1, 1]
        elevations: Optional[Sequence[float]] = None,
        masks: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
        steps_per_launch: Optional[int] = 8,
        encoder_reuse: int = 0,  # turbo (approximate; 0 = exact)
        cfg_interval=None,  # (lo, hi): CFG only where σ ∈ [lo, hi] (turbo)
        output_dtype: str = "float32",  # "uint8": denormalize on device
    ) -> np.ndarray:
        from .v2v import blend_refine_batch

        b, t = videos.shape[:2]
        n = self.mesh.shape["data"]
        if (b * t) % n:
            raise ValueError(
                f"batch×frames {b}·{t} not divisible by data axis {n}"
            )

        return blend_refine_batch(
            self.model,
            videos,
            masks=masks,
            elevations=elevations,
            rng=rng,
            steps_per_launch=steps_per_launch,
            params=self._params,
            fs_params=self._fs_params,
            shard=_mesh_put(self.mesh),
            encoder_reuse=encoder_reuse,
            cfg_interval=cfg_interval,
            output_dtype=output_dtype,
        )


class TwoStageServer:
    """Pipeline-parallel two-stage serving: each stage pinned to its own
    submesh so a pod runs both models resident simultaneously (a single
    16 GB chip cannot — full.run_two_stage loads them sequentially instead).

    Device split: both submeshes default to power-of-two sizes (frame
    counts are powers of two, so divisibility always holds); stage-2 does
    ~5.3× the per-asset device work of stage-1 (83 s vs 15.7 s marginal on
    one chip — BASELINE.md), so when capacity matters pass explicit splits
    biased toward stage 2 with a stage-2 size that divides B·T.
    `generate_stream` overlaps stage-1 of batch N+1 with stage-2 of batch N
    via a background thread (JAX dispatch is async; the two submeshes
    execute concurrently).
    """

    def __init__(
        self,
        stage1_model,
        stage2_model,
        stage1_devices: Optional[Sequence] = None,
        stage2_devices: Optional[Sequence] = None,
    ):
        from ..parallel.mesh import make_mesh

        devs = jax.devices()
        if stage1_devices is None and stage2_devices is None:
            # default: power-of-two halves — frame counts are powers of two
            # (T=16), so a power-of-two data axis always satisfies the
            # (B·T) % n divisibility RefineServer/OrbitServer require; an
            # uneven split like 2:6 would reject typical batch sizes
            half = max(1, len(devs) // 2)
            p = 1 << (half.bit_length() - 1)  # largest power of two ≤ half
            if len(devs) == 1:
                stage1_devices = stage2_devices = devs
            else:
                stage1_devices = devs[:p]
                stage2_devices = devs[p : 2 * p]
        elif stage1_devices is None:
            rest = [d for d in devs if d not in set(stage2_devices)]
            stage1_devices = rest or devs
        elif stage2_devices is None:
            rest = [d for d in devs if d not in set(stage1_devices)]
            stage2_devices = rest or devs
        self.orbit = OrbitServer(
            stage1_model, mesh=make_mesh(devices=list(stage1_devices))
        )
        self.refine = RefineServer(
            stage2_model, mesh=make_mesh(devices=list(stage2_devices))
        )

    @staticmethod
    def _to_stage2_res(videos: np.ndarray, stage2_hw) -> np.ndarray:
        if stage2_hw is None or tuple(stage2_hw) == videos.shape[2:4]:
            return videos
        import cv2

        return np.stack([
            np.stack([
                cv2.resize(f, (stage2_hw[1], stage2_hw[0])) for f in vid
            ])
            for vid in videos
        ])

    def generate(
        self,
        images: np.ndarray,  # (B, H1, W1, 3) in [-1, 1]
        elevations: Optional[Sequence[float]] = None,
        rng: Optional[jax.Array] = None,
        stage2_hw: Optional[Sequence[int]] = None,
        encoder_reuse: int = 0,
        cfg_interval=None,
        output_dtype: str = "float32",
    ) -> np.ndarray:
        """→ refined (B, T, H2, W2, 3) in [-1, 1]."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        videos = self.orbit.generate(images, elevations=elevations, rng=r1,
                                     encoder_reuse=encoder_reuse,
                                     cfg_interval=cfg_interval)
        videos = self._to_stage2_res(videos, stage2_hw)
        return self.refine.refine(videos, elevations=elevations, rng=r2,
                                  encoder_reuse=encoder_reuse,
                                  cfg_interval=cfg_interval,
                                  output_dtype=output_dtype)

    def generate_stream(self, batches, elevations=None, rng=None,
                        stage2_hw=None, encoder_reuse: int = 0,
                        cfg_interval=None, output_dtype: str = "float32"):
        """Pipelined generator over an iterable of image batches: stage-1 of
        batch N+1 runs while stage-2 of batch N drains its submesh. A
        consumer-side failure cancels the producer cleanly (no thread left
        blocked on the handoff queue). `elevations` may be a scalar (applied
        to every asset — batches may then differ in size) or a per-asset
        list applied to EVERY batch (every batch must have that size)."""
        import threading
        import queue

        if np.isscalar(elevations):
            scalar_elev = float(elevations)
            elevations = None
        else:
            scalar_elev = None
            if elevations is not None:
                elevations = list(elevations)

        def _elev(b: int):
            if scalar_elev is not None:
                return [scalar_elev] * b
            if elevations is None:
                return None
            if len(elevations) != b:
                raise ValueError(
                    f"per-asset elevations has {len(elevations)} entries but "
                    f"this batch has {b} assets — a list applies to every "
                    "batch; pass a scalar for variable-size batches"
                )
            return elevations

        if rng is None:
            rng = jax.random.PRNGKey(0)
        q: "queue.Queue" = queue.Queue(maxsize=1)
        stop = threading.Event()
        err = []

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for i, images in enumerate(batches):
                    if stop.is_set():
                        return
                    r1 = jax.random.fold_in(rng, 2 * i)
                    elev = _elev(len(images))
                    if not _put((self.orbit.generate(
                            images, elevations=elev, rng=r1,
                            encoder_reuse=encoder_reuse,
                            cfg_interval=cfg_interval), i, elev)):
                        return
            except Exception as e:  # surfaced by the consumer loop
                err.append(e)
            finally:
                _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                videos, i, elev = item
                videos = self._to_stage2_res(videos, stage2_hw)
                r2 = jax.random.fold_in(rng, 2 * i + 1)
                yield self.refine.refine(
                    videos, elevations=elev, rng=r2,
                    encoder_reuse=encoder_reuse,
                    cfg_interval=cfg_interval,
                    output_dtype=output_dtype,
                )
        finally:
            stop.set()
            t.join(timeout=30)
            if t.is_alive():
                # an in-flight stage-1 dispatch cannot be interrupted; it
                # finishes its current batch, notices `stop`, and exits
                print("[serve] stage-1 producer still draining its current "
                      "batch; submesh-1 busy until it completes")
        if err:
            raise err[0]


def _unique_names(paths: Sequence[str]) -> list:
    """File stems, de-duplicated (a.png + a.jpg must not share an output
    dir) by appending the extension and then an index if still colliding."""
    import os

    names, seen = [], set()
    for q in paths:
        base = os.path.basename(q)
        name = os.path.splitext(base)[0]
        if name in seen:
            name = base.replace(".", "_")
        stem, i = name, 1
        while name in seen:
            name, i = f"{stem}_{i}", i + 1
        seen.add(name)
        names.append(name)
    return names


def main(argv: Optional[Sequence[str]] = None) -> None:
    """Batch-serving CLI: a directory of images → per-asset orbit mp4s,
    sharded over all local devices. The reference has no serving mode (one
    asset per CLI run, pipeline_i2v_eval_v01.py); this is the TPU scale-out
    surface of the same two-stage pipeline.

    Modes:
      orbit      — stage 1 only (B assets batched over the mesh)
      two_stage  — stage 1 + stage 2 on disjoint submeshes, stage-1 of
                   batch N+1 overlapped with stage-2 of batch N
    """
    import argparse
    import glob
    import os
    import time

    from ..utils.image import load_image_rgb, resize_center_crop, to_tensor_range
    from ..utils.video import export_to_video, tensor2vid

    p = argparse.ArgumentParser(
        description="Hi3D batched serving over the local device mesh"
    )
    p.add_argument("--image_dir", required=True,
                   help="directory of input images (png/jpg)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--mode", default="orbit", choices=["orbit", "two_stage"])
    p.add_argument("--batch", type=int, default=0,
                   help="assets per batch (default: one batch of all "
                        "images); a smaller final batch is padded up to "
                        "this size so every launch reuses one compiled "
                        "executable, and the padded outputs are dropped")
    p.add_argument("--stage1_config", default="configs/inference-v01.yaml")
    p.add_argument("--stage1_checkpoint", default="ckpts/first_stage.pt")
    p.add_argument("--stage2_config", default="configs/inference-v02.yaml")
    p.add_argument("--stage2_checkpoint", default="ckpts/second_stage.pt")
    p.add_argument("--elevation", type=float, default=0.0)
    p.add_argument("--clip_size", type=int, default=16)
    p.add_argument("--resolution", type=int, nargs=2, default=[512, 512])
    p.add_argument("--stage2_resolution", type=int, nargs=2,
                   default=[1024, 1024])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--vae_bf16", action="store_true")
    p.add_argument("--encoder_reuse", type=int, default=0,
                   help="turbo: UNet encoder every k-th sampler step "
                        "(APPROXIMATE; 0 = exact)")
    p.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="turbo: CFG only on steps with σ in [LO, HI] "
                        "(guidance interval, arXiv 2404.07724; APPROXIMATE "
                        "unless it covers the whole σ schedule)")
    args = p.parse_args(argv)

    paths = sorted(
        q for pat in ("*.png", "*.jpg", "*.jpeg", "*.webp")
        for q in glob.glob(os.path.join(args.image_dir, pat))
    )
    if not paths:
        raise SystemExit(f"no images found under {args.image_dir!r}")
    res = tuple(args.resolution)
    images = np.stack([
        to_tensor_range(resize_center_crop(load_image_rgb(q), res))
        for q in paths
    ])
    names = _unique_names(paths)
    print(f"[serve] {len(paths)} assets, {jax.device_count()} devices, "
          f"mode={args.mode}")

    from .common import load_inference_model

    n_real = len(images)
    bsz = args.batch or n_real
    n_dev = jax.device_count()
    if (bsz * args.clip_size) % n_dev:
        raise SystemExit(
            f"--batch {bsz} × --clip_size {args.clip_size} must divide the "
            f"{n_dev}-device mesh; pick a batch size with "
            f"(batch·frames) % devices == 0"
        )
    # pad the final partial batch (repeating the last image) so every launch
    # has the same shape — one compiled executable — then drop the padding
    if n_real % bsz:
        pad = bsz - n_real % bsz
        images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
    batches = [images[i : i + bsz] for i in range(0, len(images), bsz)]
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    t0 = time.time()

    def _export(videos: np.ndarray, offset: int) -> None:
        for j, vid in enumerate(videos):
            if offset + j >= n_real:
                return  # padding
            name = names[offset + j]
            out = os.path.join(args.output_dir, name, "orbit.mp4")
            export_to_video(tensor2vid(vid), out, fps=args.fps)
            print(f"[serve] wrote {out}")

    if args.mode == "orbit":
        model = load_inference_model(
            args.stage1_config, args.stage1_checkpoint, res[0],
            vae_bf16=args.vae_bf16, clip_size=args.clip_size, tag="serve",
        )
        server = OrbitServer(model)
        done = 0
        for i, chunk in enumerate(batches):
            videos = server.generate(
                chunk, elevations=[args.elevation] * len(chunk),
                rng=jax.random.fold_in(rng, i),
                encoder_reuse=args.encoder_reuse,
                cfg_interval=args.cfg_interval,
                output_dtype="uint8",
            )
            _export(videos, done)
            done += len(chunk)
    else:
        m1 = load_inference_model(
            args.stage1_config, args.stage1_checkpoint, res[0],
            vae_bf16=args.vae_bf16, clip_size=args.clip_size, tag="serve",
        )
        m2 = load_inference_model(
            args.stage2_config, args.stage2_checkpoint,
            args.stage2_resolution[0],
            vae_bf16=args.vae_bf16, clip_size=args.clip_size, tag="serve",
        )
        server = TwoStageServer(m1, m2)
        done = 0
        for videos in server.generate_stream(
            batches, elevations=args.elevation, rng=rng,
            stage2_hw=tuple(args.stage2_resolution),
            encoder_reuse=args.encoder_reuse,
            cfg_interval=args.cfg_interval,
            output_dtype="uint8",
        ):
            _export(videos, done)
            done += len(videos)
    dt = time.time() - t0
    print(f"[serve] {n_real} assets in {dt:.1f}s "
          f"({dt / n_real:.1f}s/asset incl. compile)")


if __name__ == "__main__":
    main()
