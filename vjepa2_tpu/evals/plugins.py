"""Model-wrapper plugin loading (reference `evals/video_classification_frozen/models.py:14-44`).

Evals resolve their frozen-feature extractor by dotted module path from the
config (``model_kwargs.module_name``); the module must expose
``init_module(**kwargs) -> callable``. Built-in wrappers are registered
under their reference names so reference configs resolve without edits.

Contract: the returned callable takes ``(params, *batch)`` — params are an
ARGUMENT of the jitted program, never a closure capture (closure-captured
arrays are embedded in the lowered HLO as constants, which bloats compiles
and breaks remote compilation of ViT-L-sized programs).
"""

from __future__ import annotations

import importlib
from typing import Callable

_BUILTIN = {}


def register(name: str):
    def deco(fn):
        _BUILTIN[name] = fn
        return fn

    return deco


def init_module(module_name: str, **kwargs) -> Callable:
    """Resolve a wrapper factory by builtin name or dotted import path."""
    if module_name in _BUILTIN:
        return _BUILTIN[module_name](**kwargs)
    mod = importlib.import_module(module_name)
    if not hasattr(mod, "init_module"):
        raise AttributeError(f"{module_name} does not define init_module(...)")
    return mod.init_module(**kwargs)


@register("evals.video_classification_frozen.modelcustom.vit_encoder_multiclip")
def _multiclip(encoder=None, use_pos_embed: bool = False, **_):
    from vjepa2_tpu.evals.wrappers import encode_clips

    def extract(enc_params, clips, clip_indices=None):
        return encode_clips(encoder, enc_params, clips, clip_indices, use_pos_embed=use_pos_embed)

    return extract


@register("evals.video_classification_frozen.modelcustom.vit_encoder_multiclip_multilevel")
def _multiclip_multilevel(encoder=None, out_layers=(), **_):
    from vjepa2_tpu.evals.wrappers import encode_multilevel

    def extract(enc_params, clips, clip_indices=None):
        return encode_multilevel(encoder, enc_params, clips, out_layers)

    return extract


@register("evals.image_classification_frozen.modelcustom.vit_encoder")
def _image_encoder(encoder=None, img_as_video_nframes: int = 2, **_):
    from vjepa2_tpu.evals.wrappers import image_as_video

    def extract(enc_params, images, clip_indices=None):
        return encoder.apply(
            {"params": enc_params}, image_as_video(images, img_as_video_nframes)
        )

    return extract


@register("evals.action_anticipation_frozen.modelcustom.vit_encoder_predictor_concat_ar")
def _anticipative(encoder=None, predictor=None, **kw):
    from vjepa2_tpu.evals.action_anticipation import anticipative_features

    def extract(params, clips, anticipation_times):
        return anticipative_features(
            encoder, params["encoder"], predictor, params["predictor"],
            clips, anticipation_times, **kw
        )

    return extract
