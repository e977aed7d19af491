"""Video I/O: tensor→frames and mp4/gif export.

Functional parity: reference vtdm/util.py:13-51 (`tensor2vid`,
`export_to_video`) — denormalize with ImageNet-style mean/std (0.5, 0.5),
clamp, uint8 frames; export via imageio (mp4, yuv420p, configurable fps, pads
the frame list so its length is a multiple of fps) or cv2, optional gif.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def denorm_to_uint8(x):
    """[-1,1] device array → uint8 ON DEVICE (tensor2vid's exact math:
    (x·0.5+0.5)·255 rounded). Shrinks the device→host transfer 4× — through
    the tunneled TPU that transfer dominates the pipeline tail (19 s of an
    87 s stage-2 asset at fp32)."""
    import jax

    global _denorm_jit
    if _denorm_jit is None:
        import jax.numpy as jnp

        _denorm_jit = jax.jit(
            lambda v: jnp.round(
                jnp.clip(v, -1.0, 1.0) * 127.5 + 127.5
            ).astype(jnp.uint8)
        )
    return _denorm_jit(x)


_denorm_jit = None


def range_from_uint8(x):
    """uint8 device array → [-1,1] fp32 ON DEVICE (to_tensor_range's exact
    math: x/255·2−1). Lets pipelines upload 1 byte/pixel — through the
    tunneled chip the fp32 video upload costs seconds per asset."""
    import jax

    global _range_jit
    if _range_jit is None:
        import jax.numpy as jnp

        _range_jit = jax.jit(
            lambda v: v.astype(jnp.float32) / 127.5 - 1.0
        )
    return _range_jit(x)


_range_jit = None


def tensor2vid(
    video: np.ndarray,
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
) -> List[np.ndarray]:
    """(B, T, H, W, C) or (T, H, W, C) in [-1,1] → list of HWC uint8 frames.

    uint8 input (already denormalized on device — see generate_orbit/
    blend_refine `output_dtype="uint8"`) passes straight through when the
    default mean/std apply.
    """
    video = np.asarray(video)
    if video.ndim == 5:
        video = video[0]
    if (video.dtype == np.uint8
            and tuple(mean) == (0.5, 0.5, 0.5)
            and tuple(std) == (0.5, 0.5, 0.5)):
        return list(video)
    video = video.astype(np.float32)
    video = video * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    video = np.clip(video, 0.0, 1.0)
    return [(f * 255.0).round().astype(np.uint8) for f in video]


def export_to_video(
    frames: List[np.ndarray],
    output_path: str,
    fps: int = 8,
    save_to_gif: bool = False,
    use_cv2: bool = False,
    quality: int = 9,
) -> str:
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    if save_to_gif:
        import imageio

        gif_path = os.path.splitext(output_path)[0] + ".gif"
        imageio.mimsave(gif_path, frames, format="GIF", duration=1.0 / fps)
        return gif_path

    # pad so the clip length is a whole number of seconds (reference
    # vtdm/util.py:44-47 pads to a multiple of fps)
    if len(frames) % fps != 0:
        frames = list(frames) + [frames[-1]] * (fps - len(frames) % fps)

    if not use_cv2:
        # imageio's ffmpeg backend gives better-compressed yuv420p output but
        # isn't always installed; cv2 is the reliable fallback
        try:
            import imageio

            with imageio.get_writer(
                output_path, fps=fps, quality=quality, pixelformat="yuv420p"
            ) as writer:
                for f in frames:
                    writer.append_data(f)
            return output_path
        except (ImportError, ValueError):
            pass

    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    return output_path


def import_video(path: str, max_frames: Optional[int] = None) -> List[np.ndarray]:
    """Read an mp4 into a list of HWC uint8 RGB frames."""
    try:
        import imageio

        reader = imageio.get_reader(path)
        frames = []
        for i, f in enumerate(reader):
            if max_frames is not None and i >= max_frames:
                break
            frames.append(np.asarray(f)[..., :3])
        reader.close()
        return frames
    except (ImportError, ValueError):
        pass

    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while max_frames is None or len(frames) < max_frames:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames
