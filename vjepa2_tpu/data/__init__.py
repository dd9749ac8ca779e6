from vjepa2_tpu.data.loader import DataLoader, default_collate
from vjepa2_tpu.data.manager import init_video_data
from vjepa2_tpu.data.samplers import (
    DistributedSampler,
    DistributedWeightedSampler,
    MemoryEfficientDistributedWeightedSampler,
    MemoryEfficientDistributedWeightedSamplerLessRepeat,
)
from vjepa2_tpu.data.transforms import EvalVideoTransform, ImageTransform, VideoTransform
from vjepa2_tpu.data.video import VideoReader, synthetic_clip
from vjepa2_tpu.data.video_dataset import ConcatIndices, VideoDataset

__all__ = [
    "DataLoader",
    "default_collate",
    "init_video_data",
    "DistributedSampler",
    "DistributedWeightedSampler",
    "MemoryEfficientDistributedWeightedSampler",
    "MemoryEfficientDistributedWeightedSamplerLessRepeat",
    "EvalVideoTransform",
    "ImageTransform",
    "VideoTransform",
    "VideoReader",
    "synthetic_clip",
    "ConcatIndices",
    "VideoDataset",
]
