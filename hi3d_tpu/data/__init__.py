"""Data layer: Objaverse orbital-render datasets, Real-ESRGAN-style
degradation for the stage-2 refiner, and a host-side prefetching loader with
per-process sharding (the TPU equivalent of DistributedSampler)."""

from .video_dataset import (
    SyncDreamerEvalData,
    VideoDataset,
    VideoDatasetStage2,
    VideoTrainDataset,
    VideoTrainDatasetStage2,
)

__all__ = [
    "SyncDreamerEvalData",
    "VideoDataset",
    "VideoDatasetStage2",
    "VideoTrainDataset",
    "VideoTrainDatasetStage2",
]
