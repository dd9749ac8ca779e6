"""JEPA predictor (reference `src/models/predictor.py`).

A narrower ViT that consumes the encoder's *context* tokens plus learned mask
tokens at the *target* positions, and predicts target-encoder features.

TPU-native notes:

* masks are single static-shape index arrays [B, K] (the reference's
  multi-mask list handling lives in the MultiSeq wrappers at the train level,
  which call the predictor once per mask config — `src/utils/wrappers.py`);
* the reference's per-row python argsort gathers
  (`predictor.py:215-217,240-241`) become batched ``take_along_axis`` — one
  fused gather on device;
* mask tokens live in a single [num_mask_tokens, D] parameter table indexed
  by a static ``mask_index``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.models.modules import Block, LayerNorm, trunc_normal
from vjepa2_tpu.models.pos_embs import get_2d_sincos_pos_embed, get_3d_sincos_pos_embed


class VisionTransformerPredictor(nn.Module):
    img_size: tuple[int, int] = (224, 224)
    patch_size: int = 16
    num_frames: int = 1
    tubelet_size: int = 2
    embed_dim: int = 768
    predictor_embed_dim: int = 384
    depth: int = 6
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    uniform_power: bool = False
    use_mask_tokens: bool = False
    num_mask_tokens: int = 2
    zero_init_mask_tokens: bool = True
    use_silu: bool = False
    wide_silu: bool = True
    use_rope: bool = False
    use_flash: bool = False
    cp_attend: Optional[object] = None
    use_activation_checkpointing: bool = False
    remat_policy: Optional[str] = None  # see `modules.resolve_remat_policy`
    return_all_tokens: bool = False
    chop_last_n_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @property
    def is_video(self) -> bool:
        return self.num_frames > 1

    def _pos_table(self) -> np.ndarray:
        gh = self.img_size[0] // self.patch_size
        if self.is_video:
            gt = self.num_frames // self.tubelet_size
            return get_3d_sincos_pos_embed(
                self.predictor_embed_dim, gh, gt, cls_token=False, uniform_power=self.uniform_power
            ).astype(np.float32)
        return get_2d_sincos_pos_embed(self.predictor_embed_dim, gh, cls_token=False).astype(np.float32)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        masks_x: jnp.ndarray,
        masks_y: jnp.ndarray,
        mask_index: int = 1,
        h_patches: Optional[int] = None,
        w_patches: Optional[int] = None,
    ) -> jnp.ndarray:
        """x: [B, Nc, E] context tokens; masks_x: [B, Nc]; masks_y: [B, Np].

        h_patches/w_patches: static patch-grid dims of the *input clip* for
        RoPE factorization (default: the module's init grid).
        Returns [B, Np, E] predicted target features.
        """
        B, n_ctxt, _ = x.shape
        n_pred = masks_y.shape[1]
        P = self.predictor_embed_dim
        if h_patches is None:
            h_patches = self.img_size[0] // self.patch_size
        if w_patches is None:
            w_patches = self.img_size[1] // self.patch_size

        dense = lambda d, name: nn.Dense(
            d,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal(self.init_std),
            bias_init=nn.initializers.zeros,
            name=name,
        )

        tokens = dense(P, "predictor_embed")(x.astype(self.dtype))

        pos_table = None
        if not self.use_rope:
            pos_table = jnp.asarray(self._pos_table())  # [N, P]
            tokens = tokens + pos_table[masks_x.astype(jnp.int32)].astype(self.dtype)

        # Target (mask) tokens.
        if self.use_mask_tokens:
            mask_tokens = self.param(
                "mask_tokens",
                nn.initializers.zeros if self.zero_init_mask_tokens else trunc_normal(self.init_std),
                (self.num_mask_tokens, P),
                jnp.float32,
            )
            mt = mask_tokens[mask_index % self.num_mask_tokens].astype(self.dtype)
        else:
            mt = jnp.zeros((P,), self.dtype)
        pred_tokens = jnp.broadcast_to(mt, (B, n_pred, P))
        if not self.use_rope:
            pred_tokens = pred_tokens + pos_table[masks_y.astype(jnp.int32)].astype(self.dtype)

        # Concatenate and sort by position id so RoPE (and any window logic)
        # sees monotone positions; restore order afterwards.
        tokens = jnp.concatenate([tokens, pred_tokens], axis=1)  # [B, Nc+Np, P]
        positions = jnp.concatenate([masks_x, masks_y], axis=1).astype(jnp.int32)
        order = jnp.argsort(positions, axis=1)
        positions_sorted = jnp.take_along_axis(positions, order, axis=1)
        tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)

        if self.chop_last_n_tokens > 0:
            tokens = tokens[:, : -self.chop_last_n_tokens]
            positions_sorted = positions_sorted[:, : -self.chop_last_n_tokens]

        n_seq = tokens.shape[1]
        kv_valid = None
        from vjepa2_tpu.models import vision_transformer as _vt

        if _vt.STACK_PAD and self.use_flash and self.cp_attend is None:
            # stack-level padding (see `vision_transformer.py`): pad the
            # sorted ctx+target sequence once; every layer masks the static
            # pad tail in-kernel instead of padding q/k/v per call
            from vjepa2_tpu.ops.attention import _flash_pad_plan

            use_kernel, pad = _flash_pad_plan(n_seq, P // self.num_heads, False,
                                              dn_caller=True)
            if use_kernel and pad:
                tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
                positions_sorted = jnp.pad(positions_sorted, ((0, 0), (0, pad)))
                kv_valid = n_seq

        rope_cache = None
        rope_expanded = head_perm = None
        if self.use_rope:
            from vjepa2_tpu.ops.rope import build_rope_cache

            rope_cache = build_rope_cache(
                positions_sorted, P // self.num_heads, h_patches, w_patches
            )
            if _vt.ROPE_HOIST and self.use_flash and self.cp_attend is None:
                # pre-expanded split-half tables + qkv-weight-folded head
                # permutation (see `vision_transformer.py` — same r3 hoist)
                from vjepa2_tpu.ops import flash_attention as fa

                rope_expanded, perm = fa.expand_rope_cache(
                    rope_cache, P // self.num_heads
                )
                head_perm = tuple(int(i) for i in perm)
                rope_cache = None
        if self.use_activation_checkpointing:
            from vjepa2_tpu.models.modules import resolve_remat_policy

            block_cls = nn.remat(
                Block, policy=resolve_remat_policy(self.remat_policy))
        else:
            block_cls = Block
        for i in range(self.depth):
            tokens = block_cls(
                dim=P,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_rope=self.use_rope,
                use_silu=self.use_silu,
                wide_silu=self.wide_silu,
                use_flash=self.use_flash,
                cp_attend=self.cp_attend,
                layer_id=i,
                dtype=self.dtype,
                init_std=self.init_std,
                head_perm=head_perm,
                kv_valid=kv_valid,
                name=f"predictor_blocks_{i}",
            )(tokens, positions_sorted, None, h_patches, w_patches, True, rope_cache,
              rope_expanded)

        tokens = tokens[:, :n_seq]
        tokens = LayerNorm(dtype=self.dtype, name="predictor_norm")(tokens)

        if not self.return_all_tokens:
            inverse = jnp.argsort(order, axis=1)
            tokens = jnp.take_along_axis(tokens, inverse[:, :, None], axis=1)
            tokens = tokens[:, n_ctxt:]

        return dense(self.embed_dim, "predictor_proj")(tokens)


def vit_predictor(**kwargs) -> VisionTransformerPredictor:
    kwargs.setdefault("mlp_ratio", 4.0)
    kwargs.setdefault("qkv_bias", True)
    return VisionTransformerPredictor(**kwargs)
