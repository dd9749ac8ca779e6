"""Action-conditioned predictor, V-JEPA 2-AC (reference `src/models/ac_predictor.py`).

Per frame, 2-3 conditioning tokens (action, proprio state, optionally camera
extrinsics — each a linear encoding of a 7-dim pose) are interleaved ahead of
the frame's patch tokens; ACBlocks attend frame-causally (tokens see all
tokens of their own and earlier frames). Conditioning tokens are stripped and
the frame tokens projected back to the encoder dim.

The frame-causal mask is generated on the fly from frame ids inside
`ACAttention` — no materialized [N, N] buffer sliced per length
(reference builds a max_num_frames=512 mask up front, `ac_predictor.py:109-117`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vjepa2_tpu.models.modules import ACBlock, LayerNorm, trunc_normal

# A/B knob (read at trace time, `scripts/probe_ac_dn.py`): hoist the flash
# rope expansion out of the per-layer calls AND unlock ACAttention's
# narrow-head DN route (Dh=64 pads 2x in BHND). Off = the r4 path (per-layer
# rope_cache through the BHND segment kernel).
AC_ROPE_HOIST = True


class VisionTransformerPredictorAC(nn.Module):
    img_size: tuple[int, int] = (224, 224)
    patch_size: int = 16
    num_frames: int = 2
    tubelet_size: int = 2
    embed_dim: int = 768
    predictor_embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    uniform_power: bool = True
    use_silu: bool = False
    wide_silu: bool = True
    is_frame_causal: bool = True
    use_rope: bool = True
    use_flash: bool = False
    use_activation_checkpointing: bool = False
    remat_policy: Optional[str] = None  # see `modules.resolve_remat_policy`
    action_embed_dim: int = 7
    use_extrinsics: bool = False
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        actions: jnp.ndarray,
        states: jnp.ndarray,
        extrinsics: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [B, T*H'*W', E] frame tokens; actions/states: [B, T, 7].

        Returns [B, T*H'*W', E] predicted next-frame features.
        """
        gh = self.img_size[0] // self.patch_size
        gw = self.img_size[1] // self.patch_size
        B, n_ctxt, _ = x.shape
        T = n_ctxt // (gh * gw)
        P = self.predictor_embed_dim
        cond = 3 if self.use_extrinsics else 2

        dense = lambda d, name: nn.Dense(
            d,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal(self.init_std),
            bias_init=nn.initializers.zeros,
            name=name,
        )

        tokens = dense(P, "predictor_embed")(x.astype(self.dtype))
        a = dense(P, "action_encoder")(actions.astype(self.dtype))[:, :, None, :]  # [B,T,1,P]
        s = dense(P, "state_encoder")(states.astype(self.dtype))[:, :, None, :]
        tokens = tokens.reshape(B, T, gh * gw, P)
        if self.use_extrinsics:
            e = dense(P, "extrinsics_encoder")(extrinsics.astype(self.dtype))[:, :, None, :]
            tokens = jnp.concatenate([a, s, e, tokens], axis=2)
        else:
            tokens = jnp.concatenate([a, s, tokens], axis=2)
        tokens = tokens.reshape(B, T * (cond + gh * gw), P)

        from vjepa2_tpu.models.modules import build_ac_rope_cache

        rope_cache = build_ac_rope_cache(
            P // self.num_heads, T, gh, gw, cond, gh
        ) if self.use_rope else None
        # hoist the flash split-half rope expansion out of the 24 per-layer
        # calls (same machinery as `VisionTransformer`); the head permutation
        # folds into each layer's qkv weights, which also unlocks the
        # narrow-head DN route (Dh = 1024/16 = 64) in ACAttention
        rope_expanded = head_perm = None
        from vjepa2_tpu.models import vision_transformer as _vt

        if (rope_cache is not None and _vt.ROPE_HOIST and AC_ROPE_HOIST
                and self.use_flash):
            from vjepa2_tpu.ops import flash_attention as fa

            rope_expanded, perm = fa.expand_rope_cache(
                rope_cache, P // self.num_heads)
            head_perm = tuple(int(i) for i in perm)
            rope_cache = None
        # T/gh/gw/cond drive Python control flow inside ACAttention (mask
        # construction, conditioning-token splits) — keep them static under
        # remat (indices count self as 0)
        if self.use_activation_checkpointing:
            from vjepa2_tpu.models.modules import resolve_remat_policy

            block_cls = nn.remat(
                ACBlock, static_argnums=(2, 3, 4, 5),
                policy=resolve_remat_policy(self.remat_policy))
        else:
            block_cls = ACBlock
        for i in range(self.depth):
            tokens = block_cls(
                dim=P,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_silu=self.use_silu,
                wide_silu=self.wide_silu,
                grid_size=gh,
                is_frame_causal=self.is_frame_causal,
                use_flash=self.use_flash,
                layer_id=i,
                dtype=self.dtype,
                init_std=self.init_std,
                head_perm=head_perm,
                name=f"predictor_blocks_{i}",
            )(tokens, T, gh, gw, cond, rope_cache, rope_expanded)

        tokens = tokens.reshape(B, T, cond + gh * gw, P)[:, :, cond:, :]
        tokens = tokens.reshape(B, T * gh * gw, P)
        tokens = LayerNorm(dtype=self.dtype, name="predictor_norm")(tokens)
        return dense(self.embed_dim, "predictor_proj")(tokens)


def vit_ac_predictor(**kwargs) -> VisionTransformerPredictorAC:
    kwargs.setdefault("mlp_ratio", 4.0)
    kwargs.setdefault("qkv_bias", True)
    return VisionTransformerPredictorAC(**kwargs)
