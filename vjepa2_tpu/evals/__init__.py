from vjepa2_tpu.evals.image_classification import ImageClassificationEval
from vjepa2_tpu.evals.probes import ProbeConfig, ProbeGrid, warmup_cosine_probe_configs
from vjepa2_tpu.evals.video_classification import VideoClassificationEval
from vjepa2_tpu.evals.wrappers import encode_clips, encode_multilevel, image_as_video

__all__ = [
    "ImageClassificationEval",
    "ProbeConfig",
    "ProbeGrid",
    "warmup_cosine_probe_configs",
    "VideoClassificationEval",
    "encode_clips",
    "encode_multilevel",
    "image_as_video",
]
