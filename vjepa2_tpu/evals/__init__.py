from vjepa2_tpu.evals.action_anticipation import (
    AnticipationEval,
    ClassMeanRecall,
    MultiHeadAttentiveClassifier,
    anticipative_features,
    sigmoid_focal_loss,
)
from vjepa2_tpu.evals.image_classification import ImageClassificationEval
from vjepa2_tpu.evals.plugins import init_module
from vjepa2_tpu.evals.probes import ProbeConfig, ProbeGrid, warmup_cosine_probe_configs
from vjepa2_tpu.evals.video_classification import VideoClassificationEval
from vjepa2_tpu.evals.wrappers import encode_clips, encode_multilevel, image_as_video

__all__ = [
    "AnticipationEval",
    "ClassMeanRecall",
    "MultiHeadAttentiveClassifier",
    "anticipative_features",
    "sigmoid_focal_loss",
    "ImageClassificationEval",
    "init_module",
    "ProbeConfig",
    "ProbeGrid",
    "warmup_cosine_probe_configs",
    "VideoClassificationEval",
    "encode_clips",
    "encode_multilevel",
    "image_as_video",
]
