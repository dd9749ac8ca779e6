"""Tubelet/patch tokenizers (reference `src/models/utils/patch_embed.py`).

Channels-last layouts (TPU-native): images [B, H, W, C], videos
[B, T, H, W, C]. The 3D conv with stride == kernel is a single big matmul
after XLA's im2col — it lands on the MXU directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vjepa2_tpu.models.modules import trunc_normal


class PatchEmbed(nn.Module):
    """Image -> patch tokens. [B, H, W, C] -> [B, H'W', D]."""

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal(self.init_std),
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        B, H, W, D = x.shape
        return x.reshape(B, H * W, D)


class PatchEmbed3D(nn.Module):
    """Video -> tubelet tokens. [B, T, H, W, C] -> [B, T'H'W', D].

    Token order (t-major, then row, then col) matches the reference's
    ``flatten(2).transpose(1, 2)`` on [B, D, T', H', W'].
    """

    embed_dim: int
    patch_size: int = 16
    tubelet_size: int = 2
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x):
        p, t = self.patch_size, self.tubelet_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(t, p, p),
            strides=(t, p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal(self.init_std),
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        B, T, H, W, D = x.shape
        return x.reshape(B, T * H * W, D)
