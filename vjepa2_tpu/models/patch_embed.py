"""Tubelet/patch tokenizers (reference `src/models/utils/patch_embed.py`).

Channels-last layouts (TPU-native): images [B, H, W, C], videos
[B, T, H, W, C]. With stride == kernel the convolution is mathematically a
patchify-reshape followed by one matmul — and that is how it is computed
here: XLA's general-conv lowering measured ~45x the matmul's FLOP cost on
v5e (45.5 ms of a 558 ms ViT-L pretrain step, device trace), while the
explicit reshape + dot runs on the MXU directly. Parameters keep the conv
layout ([t, p, p, C, D] kernel under `proj/kernel`) so checkpoints and the
torch converter are unaffected.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vjepa2_tpu.models.modules import trunc_normal


class _ConvAsMatmul(nn.Module):
    """Holds a conv-layout kernel, applies it as a matmul over pre-extracted
    patch vectors (feature order must match the kernel's spatial order)."""

    kernel_shape: tuple  # (..., C, D) — conv layout
    dtype: jnp.dtype
    init_std: float

    @nn.compact
    def __call__(self, patches):  # [B, N, prod(kernel_shape[:-1])]
        kernel = self.param("kernel", trunc_normal(self.init_std), self.kernel_shape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.kernel_shape[-1],),
                          jnp.float32)
        w = kernel.reshape(-1, self.kernel_shape[-1]).astype(self.dtype)
        return patches @ w + bias.astype(self.dtype)


class PatchEmbed(nn.Module):
    """Image -> patch tokens. [B, H, W, C] -> [B, H'W', D]."""

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        B, H, W, C = x.shape
        x = x.astype(self.dtype)
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, H', W', p, p, C]
        x = x.reshape(B, (H // p) * (W // p), p * p * C)
        return _ConvAsMatmul(
            kernel_shape=(p, p, C, self.embed_dim),
            dtype=self.dtype, init_std=self.init_std, name="proj",
        )(x)


class PatchEmbed3D(nn.Module):
    """Video -> tubelet tokens. [B, T, H, W, C] -> [B, T'H'W', D].

    Token order (t-major, then row, then col) matches the reference's
    ``flatten(2).transpose(1, 2)`` on [B, D, T', H', W']; the patch feature
    order (t, p, p, C) matches the conv kernel layout.
    """

    embed_dim: int
    patch_size: int = 16
    tubelet_size: int = 2
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x):
        p, t = self.patch_size, self.tubelet_size
        B, T, H, W, C = x.shape
        x = x.astype(self.dtype)
        x = x.reshape(B, T // t, t, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [B, T', H', W', t, p, p, C]
        x = x.reshape(B, (T // t) * (H // p) * (W // p), t * p * p * C)
        return _ConvAsMatmul(
            kernel_shape=(t, p, p, C, self.embed_dim),
            dtype=self.dtype, init_std=self.init_std, name="proj",
        )(x)
