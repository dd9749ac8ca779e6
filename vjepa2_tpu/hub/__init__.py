from vjepa2_tpu.hub.backbones import (
    ARCH_NAME_MAP,
    vjepa2_ac_vit_giant,
    vjepa2_vit_giant,
    vjepa2_vit_giant_384,
    vjepa2_vit_huge,
    vjepa2_vit_large,
)
from vjepa2_tpu.hub.converter import (
    convert_ac_predictor,
    convert_checkpoint,
    convert_encoder,
    convert_predictor,
    load_torch_checkpoint,
)
from vjepa2_tpu.hub.export import (
    export_encoder,
    export_world_model,
    load_encoder,
    load_world_model,
)
from vjepa2_tpu.hub.preprocessor import Preprocessor, vjepa2_preprocessor

__all__ = [
    "export_encoder",
    "load_encoder",
    "export_world_model",
    "load_world_model",
    "ARCH_NAME_MAP",
    "vjepa2_vit_large",
    "vjepa2_vit_huge",
    "vjepa2_vit_giant",
    "vjepa2_vit_giant_384",
    "vjepa2_ac_vit_giant",
    "convert_checkpoint",
    "convert_encoder",
    "convert_predictor",
    "convert_ac_predictor",
    "load_torch_checkpoint",
    "Preprocessor",
    "vjepa2_preprocessor",
]
