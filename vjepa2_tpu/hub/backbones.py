"""Public model factories (reference `src/hub/backbones.py`, `hubconf.py`).

``vjepa2_vit_large/huge/giant/giant_384`` build the (encoder, predictor) pair
with the released-checkpoint architecture (RoPE on, predictor depth 12 /
dim 384 / 10 mask tokens); ``vjepa2_ac_vit_giant`` builds the AC pair.
Passing ``checkpoint=<path to a torch .pt>`` converts the released torch
weights into flax params (zero-egress environments load from local disk
instead of `dl.fbaipublicfiles.com`).

Returns (module, params) pairs; ``params`` is None when no checkpoint given.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vjepa2_tpu.hub.converter import (
    clean_prefixes,
    convert_ac_predictor,
    convert_encoder,
    convert_predictor,
    load_torch_checkpoint,
)
from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
from vjepa2_tpu.models.predictor import vit_predictor
from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

ARCH_NAME_MAP = {
    "vit_large": ("vit_large", "vitl"),
    "vit_huge": ("vit_huge", "vith"),
    "vit_giant": ("vit_giant_xformers", "vitg"),
    "vit_ac_giant": ("vit_giant_xformers", "vjepa2-ac-vitg"),
    "vit_giant_384": ("vit_giant_xformers", "vitg-384"),
}


def _make_vjepa2_model(
    model_name: str = "vit_large",
    img_size: int = 256,
    patch_size: int = 16,
    tubelet_size: int = 2,
    num_frames: int = 64,
    checkpoint: Optional[str] = None,
    dtype=jnp.float32,
    **kwargs,
):
    arch = ARCH_NAME_MAP[model_name][0]
    encoder = MODEL_REGISTRY[arch](
        patch_size=patch_size,
        img_size=(img_size, img_size),
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        uniform_power=False,
        use_rope=True,
        dtype=dtype,
        **kwargs,
    )
    predictor = vit_predictor(
        img_size=(img_size, img_size),
        patch_size=patch_size,
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        embed_dim=encoder.embed_dim,
        predictor_embed_dim=384,
        depth=12,
        num_heads=12,
        num_mask_tokens=10,
        use_mask_tokens=True,
        use_rope=True,
        uniform_power=False,
        dtype=dtype,
    )
    enc_params = pred_params = None
    if checkpoint is not None:
        ckpt = load_torch_checkpoint(checkpoint)
        enc_sd = ckpt.get("encoder", ckpt.get("target_encoder", ckpt))
        enc_params = convert_encoder(clean_prefixes(enc_sd))
        if "predictor" in ckpt:
            pred_params = convert_predictor(clean_prefixes(ckpt["predictor"]))
    return (encoder, enc_params), (predictor, pred_params)


def _make_vjepa2_ac_model(
    model_name: str = "vit_ac_giant",
    img_size: int = 256,
    patch_size: int = 16,
    tubelet_size: int = 2,
    num_frames: int = 64,
    checkpoint: Optional[str] = None,
    dtype=jnp.float32,
    **kwargs,
):
    arch = ARCH_NAME_MAP[model_name][0]
    encoder = MODEL_REGISTRY[arch](
        patch_size=patch_size,
        img_size=(img_size, img_size),
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        uniform_power=False,
        use_rope=True,
        dtype=dtype,
        **kwargs,
    )
    predictor = vit_ac_predictor(
        img_size=(img_size, img_size),
        patch_size=patch_size,
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        embed_dim=encoder.embed_dim,
        dtype=dtype,
    )
    enc_params = pred_params = None
    if checkpoint is not None:
        ckpt = load_torch_checkpoint(checkpoint)
        enc_params = convert_encoder(clean_prefixes(ckpt["encoder"]))
        pred_params = convert_ac_predictor(clean_prefixes(ckpt["predictor"]))
    return (encoder, enc_params), (predictor, pred_params)


def vjepa2_vit_large(**kwargs):
    return _make_vjepa2_model(model_name="vit_large", img_size=256, **kwargs)


def vjepa2_vit_huge(**kwargs):
    return _make_vjepa2_model(model_name="vit_huge", img_size=256, **kwargs)


def vjepa2_vit_giant(**kwargs):
    return _make_vjepa2_model(model_name="vit_giant", img_size=256, **kwargs)


def vjepa2_vit_giant_384(**kwargs):
    return _make_vjepa2_model(model_name="vit_giant_384", img_size=384, **kwargs)


def vjepa2_ac_vit_giant(**kwargs):
    return _make_vjepa2_ac_model(model_name="vit_ac_giant", img_size=256, **kwargs)
