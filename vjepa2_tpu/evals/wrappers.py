"""Frozen-encoder feature extractors for evals.

`ClipAggregation` (reference
`evals/video_classification_frozen/modelcustom/vit_encoder_multiclip.py:101-180`):
encode each clip independently through the frozen video encoder and
concatenate tokens, optionally adding a 1D sincos temporal embed indexed by
clip position. `MultiLevelClipAggregation` concatenates multiple encoder
layers (`..._multilevel.py`). `ImageAsVideo` replicates a still image to a
2-frame clip (reference `image_classification_frozen/modelcustom/vit_encoder.py:56-66`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.models.pos_embs import get_1d_sincos_pos_embed
from vjepa2_tpu.models.vision_transformer import VisionTransformer


def encode_clips(
    encoder: VisionTransformer,
    enc_params,
    clips: jnp.ndarray,
    clip_indices: Optional[jnp.ndarray] = None,
    use_pos_embed: bool = False,
    max_frames: int = 10000,
    tubelet_size: int = 2,
) -> jnp.ndarray:
    """clips: [B, num_clips, T, H, W, C] -> [B, num_clips*N, D] frozen features.

    clip_indices: [B, num_clips, T] frame indices (for the temporal embed).
    """
    B, nc = clips.shape[0], clips.shape[1]
    flat = clips.reshape((B * nc,) + clips.shape[2:])
    feats = encoder.apply({"params": enc_params}, flat)  # [B*nc, N, D]
    N, D = feats.shape[1], feats.shape[2]
    feats = feats.reshape(B, nc * N, D)

    if use_pos_embed and clip_indices is not None:
        # 1D temporal embed over absolute frame index, one entry per tubelet,
        # repeated across that tubelet's spatial tokens (reference
        # `vit_encoder_multiclip.py:137-146`: table gathered at
        # clip_indices[::tubelet_size]).
        table = jnp.asarray(
            get_1d_sincos_pos_embed(D, max_frames).astype(np.float32)
        )  # [max_frames, D]
        idx = clip_indices[:, :, ::tubelet_size]  # [B, nc, T'] first frame per tubelet
        t_prime = idx.shape[2]
        s_tokens = N // t_prime  # tokens are t-major within a clip
        emb = table[idx.astype(jnp.int32)]  # [B, nc, T', D]
        emb = jnp.repeat(emb, s_tokens, axis=2)  # [B, nc, T'*S, D]
        feats = feats + emb.reshape(B, nc * N, D)
    return feats


def encode_multilevel(
    encoder: VisionTransformer,
    enc_params,
    clips: jnp.ndarray,
    out_layers: Sequence[int],
) -> jnp.ndarray:
    """Concatenate per-layer features along the token axis."""
    B, nc = clips.shape[0], clips.shape[1]
    flat = clips.reshape((B * nc,) + clips.shape[2:])
    feats_list = encoder.apply({"params": enc_params}, flat)  # list of [B*nc, N, D]
    feats = jnp.concatenate(feats_list, axis=1)
    N, D = feats.shape[1], feats.shape[2]
    return feats.reshape(B, nc * N, D)


def image_as_video(images: jnp.ndarray, tubelet_size: int = 2) -> jnp.ndarray:
    """[B, H, W, C] -> [B, tubelet_size, H, W, C] replicated frames."""
    return jnp.repeat(images[:, None], tubelet_size, axis=1)
