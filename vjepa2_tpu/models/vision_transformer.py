"""Video/image ViT encoder (reference `src/models/vision_transformer.py`).

TPU-first re-design:

* channels-last input ([B, T, H, W, C] video / [B, H, W, C] image);
* masked tokens are gathered out *before* the blocks (sequence shortening ==
  the reference's main FLOP saver), with RoPE position ids carried alongside;
* sincos pos-embed path keeps the table as a traced constant (no param) and
  resizes it with `jax.image.resize` (trilinear) for off-grid input sizes;
* activation checkpointing via `nn.remat` on whole blocks;
* everything static-shaped: H'/W'/T' come from the (static) input shape.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.models.modules import Block, LayerNorm
from vjepa2_tpu.models.patch_embed import PatchEmbed, PatchEmbed3D
from vjepa2_tpu.models.pos_embs import get_2d_sincos_pos_embed, get_3d_sincos_pos_embed
from vjepa2_tpu.ops.masking import apply_masks
from vjepa2_tpu.ops.rope import build_rope_cache

# Trace-time perf knobs (step-level A/B, scripts/probe_regress.py):
# STACK_PAD pads the token stream ONCE and tail-masks pad keys in-kernel;
# ROPE_HOIST pre-expands the flash rope tables once per forward. Both are
# the shipped defaults; the flags exist so regressions bisect in minutes.
STACK_PAD = True
ROPE_HOIST = True


class VisionTransformer(nn.Module):
    img_size: tuple[int, int] = (224, 224)
    patch_size: int = 16
    num_frames: int = 1
    tubelet_size: int = 2
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    uniform_power: bool = False
    use_silu: bool = False
    wide_silu: bool = True
    use_rope: bool = False
    use_activation_checkpointing: bool = False
    # remat policy name (`modules.resolve_remat_policy`): None/'full' =
    # recompute everything; 'save_attn'[-'_qkv'] = keep the flash kernels'
    # (out, lse) [+ q/k/v] so the bwd never re-runs the attention fwd —
    # the dominant recompute at long-clip shapes (VERDICT r5 #1)
    remat_policy: Optional[str] = None
    use_flash: bool = False  # Pallas flash attention (fwd + custom VJP)
    cp_attend: Optional[object] = None  # ring-attention context parallelism
    out_layers: Optional[Sequence[int]] = None
    handle_nonsquare_inputs: bool = True
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02

    @property
    def is_video(self) -> bool:
        return self.num_frames > 1

    def _sincos_table(self, t_patches: int, h_patches: int, w_patches: int) -> jnp.ndarray:
        """Sincos table for the *init* grid, resized to the input grid if needed.

        Mirrors reference ``interpolate_pos_encoding``
        (`vision_transformer.py:215-272`) including the chop-early-frames
        shortcut for shorter clips at the trained spatial size.
        """
        gh = self.img_size[0] // self.patch_size
        gw = self.img_size[1] // self.patch_size
        if self.is_video:
            gt = self.num_frames // self.tubelet_size
            table = get_3d_sincos_pos_embed(
                self.embed_dim, gh, gt, cls_token=False, uniform_power=self.uniform_power
            ).astype(np.float32)
            if (t_patches, h_patches, w_patches) == (gt, gh, gw):
                return jnp.asarray(table)
            if (h_patches, w_patches) == (gh, gw) and t_patches < gt:
                return jnp.asarray(table[: t_patches * gh * gw])
            grid = jnp.asarray(table).reshape(gt, gh, gw, self.embed_dim)
            grid = jax.image.resize(
                grid, (t_patches, h_patches, w_patches, self.embed_dim), method="trilinear"
            )
            return grid.reshape(-1, self.embed_dim)
        else:
            table = get_2d_sincos_pos_embed(self.embed_dim, gh, cls_token=False).astype(np.float32)
            if (h_patches, w_patches) == (gh, gw):
                return jnp.asarray(table)
            grid = jnp.asarray(table).reshape(gh, gw, self.embed_dim)
            grid = jax.image.resize(grid, (h_patches, w_patches, self.embed_dim), method="bicubic")
            return grid.reshape(-1, self.embed_dim)

    @nn.compact
    def __call__(self, x, masks=None, stage: str = "full"):
        """x: [B, T, H, W, C] (video) or [B, H, W, C] (image).

        masks: None, a [B, K] int index array, or a list of them. With a list
        the outputs are stacked along batch (reference semantics).
        Returns [B*len(masks), K, D] tokens (or list of per-layer outputs when
        ``out_layers`` is set).

        ``stage="pre"`` (pipeline parallelism, `core/pipeline.py`) stops just
        before the block stack and returns ``(tokens, aux)`` where ``aux``
        carries everything a pipeline stage needs to run a standalone
        ``Block`` on an activation shard: traced arrays (pos_ids, rope
        tables) plus trace-time-static python values (head_perm, kv_valid,
        n_real, patch grid). The block/norm params are simply unused by this
        call path (flax ``apply`` ignores unused param subtrees).
        """
        if masks is not None and not isinstance(masks, (list, tuple)):
            masks = [masks]

        if x.ndim == 4:
            _, H, W, _ = x.shape
            t_patches = 1
        else:
            _, T, H, W, _ = x.shape
            t_patches = T // self.tubelet_size
        h_patches = H // self.patch_size
        w_patches = W // self.patch_size

        if self.is_video:
            tokens = PatchEmbed3D(
                embed_dim=self.embed_dim,
                patch_size=self.patch_size,
                tubelet_size=self.tubelet_size,
                dtype=self.dtype,
                init_std=self.init_std,
                name="patch_embed",
            )(x.astype(self.dtype))
        else:
            tokens = PatchEmbed(
                embed_dim=self.embed_dim,
                patch_size=self.patch_size,
                dtype=self.dtype,
                init_std=self.init_std,
                name="patch_embed",
            )(x.astype(self.dtype))

        if not self.use_rope:
            pos = self._sincos_table(t_patches, h_patches, w_patches)
            tokens = tokens + pos[None].astype(self.dtype)

        pos_ids = None
        kv_valid = None
        if masks is not None:
            tokens = apply_masks(tokens, masks)
            pos_ids = jnp.concatenate([m.astype(jnp.int32) for m in masks], axis=0)
        elif self.use_rope:
            pos_ids = jnp.arange(t_patches * h_patches * w_patches, dtype=jnp.int32)

        n_real = tokens.shape[1]
        if STACK_PAD and self.use_flash and self.cp_attend is None:
            # STACK-LEVEL padding (r3): pad the token sequence once to a
            # block-friendly length and run every layer with a static
            # ``kv_valid`` tail mask, instead of padding/slicing q/k/v around
            # every flash call (the per-layer pads+slices were ~40 ms/step of
            # the ViT-L trace's copy bucket). Pad rows are sliced off at the
            # end; their K columns are masked in-kernel, so outputs for real
            # tokens are bit-identical.
            from vjepa2_tpu.ops.attention import _flash_pad_plan

            use_kernel, pad = _flash_pad_plan(n_real, self.embed_dim // self.num_heads,
                                              False, dn_caller=True)
            if use_kernel and pad:
                tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
                if pos_ids is not None:
                    widths = ((0, pad),) if pos_ids.ndim == 1 else ((0, 0), (0, pad))
                    pos_ids = jnp.pad(pos_ids, widths)
                kv_valid = n_real

        if not self.handle_nonsquare_inputs:
            h_patches = w_patches = self.img_size[0] // self.patch_size

        block_cls = Block
        if self.use_activation_checkpointing:
            # h_patches/w_patches ride through as weak-typed scalars; all uses
            # are arithmetic, so tracing them is safe.
            from vjepa2_tpu.models.modules import resolve_remat_policy

            block_cls = nn.remat(
                Block, policy=resolve_remat_policy(self.remat_policy))

        rope_cache = None
        rope_expanded = head_perm = None
        if self.use_rope:
            # one fused cos/sin table shared by every layer
            rope_cache = build_rope_cache(
                pos_ids, self.embed_dim // self.num_heads, h_patches, w_patches
            )
            if ROPE_HOIST and self.use_flash and self.cp_attend is None:
                # hoist the flash split-half expansion out of the per-layer
                # calls; the head permutation folds into each layer's qkv
                # weights (r3 trace: ~4 fusions/call, ~20 ms/step at ViT-L)
                from vjepa2_tpu.ops import flash_attention as fa

                rope_expanded, perm = fa.expand_rope_cache(
                    rope_cache, self.embed_dim // self.num_heads
                )
                head_perm = tuple(int(i) for i in perm)
                rope_cache = None

        if stage == "pre":
            assert self.out_layers is None, "pipeline mode has no out_layers taps"
            return tokens, {
                "pos_ids": pos_ids,
                "rope_cache": rope_cache,
                "rope_expanded": rope_expanded,
                "head_perm": head_perm,
                "kv_valid": kv_valid,
                "n_real": n_real,
                "h_patches": h_patches,
                "w_patches": w_patches,
            }

        norm = LayerNorm(dtype=self.dtype, name="norm")  # shared across taps
        outs = []
        for i in range(self.depth):
            tokens = block_cls(
                dim=self.embed_dim,
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
                name=f"blocks_{i}",
            )(tokens, pos_ids, None, h_patches, w_patches, True, rope_cache,
              rope_expanded)
            if self.out_layers is not None and i in self.out_layers:
                outs.append(norm(tokens[:, :n_real]))

        if self.out_layers is not None:
            return outs
        return norm(tokens[:, :n_real])


def _factory(embed_dim, depth, num_heads, mlp_ratio, use_rope=False):
    def make(patch_size=16, **kwargs):
        kwargs.setdefault("use_rope", use_rope)
        return VisionTransformer(
            patch_size=patch_size,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            mlp_ratio=mlp_ratio,
            qkv_bias=True,
            **kwargs,
        )

    return make


# Factories mirror reference `vision_transformer.py:275-475`.
vit_synthetic = _factory(1, 1, 1, 4)
vit_tiny = _factory(192, 12, 3, 4)
vit_small = _factory(384, 12, 6, 4)
vit_base = _factory(768, 12, 12, 4)
vit_large = _factory(1024, 24, 16, 4)
vit_huge = _factory(1280, 32, 16, 4)
vit_giant = _factory(1408, 40, 16, 48 / 11)
vit_giant_xformers = _factory(1408, 40, 22, 48 / 11)
vit_gigantic = _factory(1664, 48, 16, 64 / 13)
vit_gigantic_xformers = _factory(1664, 48, 26, 64 / 13)
vit_large_rope = _factory(1024, 24, 16, 4, use_rope=True)
vit_huge_rope = _factory(1280, 32, 16, 4, use_rope=True)
vit_giant_rope = _factory(1408, 40, 16, 48 / 11, use_rope=True)
vit_giant_xformers_rope = _factory(1408, 40, 22, 48 / 11, use_rope=True)

VIT_EMBED_DIMS = {
    "vit_synthetic": 1,
    "vit_tiny": 192,
    "vit_small": 384,
    "vit_base": 768,
    "vit_large": 1024,
    "vit_huge": 1280,
    "vit_giant": 1408,
    "vit_gigantic": 1664,
}

MODEL_REGISTRY = {
    name: fn
    for name, fn in globals().items()
    if name.startswith("vit_") and callable(fn) and name != "vit_factory"
}
