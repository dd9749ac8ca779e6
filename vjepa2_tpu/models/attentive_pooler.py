"""Attentive pooler / classifier probes (reference `src/models/attentive_pooler.py`).

A learnable query cross-attends into frozen features; an optional stack of
self-attention blocks precedes it. `AttentiveClassifier` adds a linear head.

Probe grids (the reference trains ~20 probes with different LR/WD in
parallel, `evals/video_classification_frozen/eval.py`) are trained by
``jax.vmap`` over probe params in `vjepa2_tpu.evals` — a genuine TPU win.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from vjepa2_tpu.models.modules import Block, CrossAttention, CrossAttentionBlock, trunc_normal


class AttentivePooler(nn.Module):
    num_queries: int = 1
    embed_dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    depth: int = 1
    qkv_bias: bool = True
    complete_block: bool = True
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x):
        q = self.param(
            "query_tokens", trunc_normal(self.init_std), (1, self.num_queries, self.embed_dim), jnp.float32
        )
        for i in range(self.depth - 1):
            x = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                layer_id=i,
                dtype=self.dtype,
                init_std=self.init_std,
                name=f"blocks_{i}",
            )(x)
        # Reference rescales the cross-block MLP by 1/sqrt(2*(depth-1+1)).
        mlp_scale = 1.0 / math.sqrt(2.0 * max(1, self.depth - 1) if self.depth > 1 else 2.0)
        if self.complete_block:
            q = CrossAttentionBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                init_std=self.init_std,
                mlp_init_scale=mlp_scale,
                name="cross_attention_block",
            )(jnp.broadcast_to(q, (x.shape[0],) + q.shape[1:]).astype(self.dtype), x.astype(self.dtype))
        else:
            q = CrossAttention(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                init_std=self.init_std,
                name="cross_attention_block",
            )(jnp.broadcast_to(q, (x.shape[0],) + q.shape[1:]).astype(self.dtype), x.astype(self.dtype))
        return q


class AttentiveClassifier(nn.Module):
    embed_dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    depth: int = 1
    qkv_bias: bool = True
    num_classes: int = 1000
    complete_block: bool = True
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x):
        q = AttentivePooler(
            num_queries=1,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            depth=self.depth,
            qkv_bias=self.qkv_bias,
            complete_block=self.complete_block,
            dtype=self.dtype,
            init_std=self.init_std,
            name="pooler",
        )(x)[:, 0]
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal(self.init_std),
            bias_init=nn.initializers.zeros,
            name="linear",
        )(q.astype(jnp.float32))
