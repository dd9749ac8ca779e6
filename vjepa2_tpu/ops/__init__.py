from vjepa2_tpu.ops.attention import sdpa
from vjepa2_tpu.ops.masking import apply_mask, apply_masks
from vjepa2_tpu.ops.rope import (
    apply_rope_1d,
    apply_rope_3d,
    rope_3d_dims,
    rope_angles,
    rotate_pairs,
    rotate_queries_or_keys,
    separate_positions,
)

__all__ = [
    "sdpa",
    "apply_mask",
    "apply_masks",
    "apply_rope_1d",
    "apply_rope_3d",
    "rope_3d_dims",
    "rope_angles",
    "rotate_pairs",
    "rotate_queries_or_keys",
    "separate_positions",
]
