"""Token-index masking ops (gather-based, static shapes).

The reference keeps masks as *index lists* and gathers kept tokens
(`src/masks/utils.py:9-21`). On TPU we do the same with
``jnp.take_along_axis`` — a cheap gather that shortens the sequence fed to
the transformer, which is the reference's main FLOP-saving device.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Gather kept tokens. x: [B, N, D]; mask: [B, K] int indices -> [B, K, D]."""
    return jnp.take_along_axis(x, mask[:, :, None].astype(jnp.int32), axis=1)


def apply_masks(x: jnp.ndarray, masks, concat_axis: int = 0):
    """Gather tokens for a list of masks.

    concat_axis=0 mirrors the reference's ``apply_masks(..., concat=True)``
    which stacks the per-mask gathers along the batch dim; pass
    ``concat_axis=None`` to get a list.
    """
    if not isinstance(masks, (list, tuple)):
        masks = [masks]
    outs = [apply_mask(x, m) for m in masks]
    if concat_axis is None:
        return outs
    return jnp.concatenate(outs, axis=concat_axis)
