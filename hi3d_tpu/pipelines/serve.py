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

    def _shard(self, tree: Dict) -> Dict:
        return jax.tree.map(_mesh_put(self.mesh), tree)

    def generate(
        self,
        images: np.ndarray,  # (B, H, W, 3) in [-1, 1]
        elevations: Optional[Sequence[float]] = None,
        rng: Optional[jax.Array] = None,
        encoder_reuse: int = 0,  # turbo (approximate; 0 = exact)
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
            encoder_reuse=encoder_reuse,
        )
        decoded = model.decode_first_stage(samples)
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

    def refine(
        self,
        videos: np.ndarray,  # (B, T, H, W, 3) in [-1, 1]
        elevations: Optional[Sequence[float]] = None,
        masks: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
        steps_per_launch: Optional[int] = 8,
        encoder_reuse: int = 0,  # turbo (approximate; 0 = exact)
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
            shard=_mesh_put(self.mesh),
            encoder_reuse=encoder_reuse,
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
    ) -> np.ndarray:
        """→ refined (B, T, H2, W2, 3) in [-1, 1]."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        videos = self.orbit.generate(images, elevations=elevations, rng=r1)
        videos = self._to_stage2_res(videos, stage2_hw)
        return self.refine.refine(videos, elevations=elevations, rng=r2)

    def generate_stream(self, batches, elevations=None, rng=None,
                        stage2_hw=None):
        """Pipelined generator over an iterable of image batches: stage-1 of
        batch N+1 runs while stage-2 of batch N drains its submesh. A
        consumer-side failure cancels the producer cleanly (no thread left
        blocked on the handoff queue)."""
        import threading
        import queue

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
                    if not _put((self.orbit.generate(
                            images, elevations=elevations, rng=r1), i)):
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
                videos, i = item
                videos = self._to_stage2_res(videos, stage2_hw)
                r2 = jax.random.fold_in(rng, 2 * i + 1)
                yield self.refine.refine(
                    videos, elevations=elevations, rng=r2
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
