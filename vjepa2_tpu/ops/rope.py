"""3D rotary position embedding with explicit per-token position ids.

V-JEPA 2 drops masked tokens *before* the transformer blocks, so token
positions are sparse/non-contiguous. Instead of materializing positional
embeddings, the rotary path factorizes each flat token index into
(frame, row, col) ids and rotates disjoint thirds of every attention head
with the respective 1-D rotary angles.

Numerical contract (matches reference `src/models/utils/modules.py:26-50`):
the reference builds cos/sin by *tiling* the D/2 frequencies across the last
dim (``repeat(..., 2)``) while rotating *interleaved* pairs
``(x[2i], x[2i+1]) -> (-x[2i+1], x[2i])``. We reproduce that exact variant so
converted checkpoints are bit-compatible in fp32.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(pos: jnp.ndarray, dim: int, theta: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) of shape ``pos.shape + (dim,)`` using tiled frequencies.

    pos: float or int array of positions, any shape (typically [B, N] or [N]).
    dim: size of the rotated subspace (must be even).
    """
    assert dim % 2 == 0, "rotary subspace must be even"
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / (theta**omega)  # (dim/2,)
    freq = pos.astype(jnp.float32)[..., None] * omega  # (..., dim/2)
    # Reference tiles [f0..f_{d/2-1}, f0..f_{d/2-1}] (torch .repeat), not interleave.
    freq = jnp.concatenate([freq, freq], axis=-1)  # (..., dim)
    return jnp.cos(freq), jnp.sin(freq)


def rotate_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """Map interleaved pairs (x0, x1) -> (-x1, x0) along the last dim."""
    y = x.reshape(*x.shape[:-1], -1, 2)
    y = jnp.stack([-y[..., 1], y[..., 0]], axis=-1)
    return y.reshape(x.shape)


def rotate_queries_or_keys(x: jnp.ndarray, pos: jnp.ndarray, theta: float = 10000.0) -> jnp.ndarray:
    """Rotate ``x`` (..., N, D) by positions ``pos`` (broadcastable to (..., N)).

    Equivalent to reference ``rotate_queries_or_keys`` for fp32 inputs.
    """
    cos, sin = rope_angles(pos, x.shape[-1], theta)
    # cos/sin: (..., N, D); broadcast against x.
    return (x * cos + rotate_pairs(x) * sin).astype(x.dtype)


def separate_positions(ids: jnp.ndarray, h_patches: int, w_patches: int):
    """Factorize flat token ids into (frame, row, col) ids.

    Matches reference ``RoPEAttention.separate_positions``
    (`src/models/utils/modules.py:311-324`).
    """
    tokens_per_frame = h_patches * w_patches
    frame_ids = ids // tokens_per_frame
    rem = ids - tokens_per_frame * frame_ids
    height_ids = rem // w_patches
    width_ids = rem - w_patches * height_ids
    return frame_ids, height_ids, width_ids


def rope_3d_dims(head_dim: int) -> tuple[int, int, int]:
    """Sizes of the (depth, height, width) rotary subspaces for a head.

    Matches reference: ``d_dim = h_dim = w_dim = 2 * ((head_dim // 3) // 2)``;
    any remainder of the head dim is left unrotated.
    """
    d = 2 * ((head_dim // 3) // 2)
    return d, d, d


def apply_rope_3d(
    x: jnp.ndarray,
    pos_ids: jnp.ndarray,
    h_patches: int,
    w_patches: int,
    grid_size: int | None = None,
    theta: float = 10000.0,
) -> jnp.ndarray:
    """Apply factorized 3D RoPE to q or k of shape [B, N, H, Dh].

    pos_ids: [B, N] or [N] int flat token indices into the (T, H', W') grid.
    grid_size: if given, spatial ids are rescaled by grid_size / {H',W'}
        ("snap to grid", used by the AC predictor,
        reference `modules.py:174-176`).
    """
    head_dim = x.shape[-1]
    d_dim, h_dim, w_dim = rope_3d_dims(head_dim)
    d_ids, h_ids, w_ids = separate_positions(pos_ids, h_patches, w_patches)
    d_ids = d_ids.astype(jnp.float32)
    h_ids = h_ids.astype(jnp.float32)
    w_ids = w_ids.astype(jnp.float32)
    if grid_size is not None:
        h_ids = h_ids * (grid_size / h_patches)
        w_ids = w_ids * (grid_size / w_patches)

    def rot(sub, ids, dim):
        # sub: [B, N, H, dim]; ids: [B, N] or [N] -> broadcast to [..., N, 1, dim]
        cos, sin = rope_angles(ids, dim, theta)
        cos = cos[..., None, :]
        sin = sin[..., None, :]
        return (sub * cos + rotate_pairs(sub) * sin).astype(sub.dtype)

    s = 0
    out = []
    out.append(rot(x[..., s : s + d_dim], d_ids, d_dim))
    s += d_dim
    out.append(rot(x[..., s : s + h_dim], h_ids, h_dim))
    s += h_dim
    out.append(rot(x[..., s : s + w_dim], w_ids, w_dim))
    s += w_dim
    if s < head_dim:
        out.append(x[..., s:])
    return jnp.concatenate(out, axis=-1)


def build_rope_cache(
    pos_ids: jnp.ndarray,
    head_dim: int,
    h_patches: int,
    w_patches: int,
    grid_size: int | None = None,
    theta: float = 10000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute fused (cos, sin) for the 3 factorized subspaces.

    Computing angles once per forward (instead of per layer) and
    concatenating the d/h/w subspace tables lets every layer apply RoPE as a
    single elementwise op over the first ``rot`` features.

    pos_ids: [B, N] or [N]. Returns (cos, sin) of shape pos.shape + (rot,)
    where ``rot`` = d_dim + h_dim + w_dim.
    """
    d_dim, h_dim, w_dim = rope_3d_dims(head_dim)
    d_ids, h_ids, w_ids = separate_positions(pos_ids, h_patches, w_patches)
    d_ids = d_ids.astype(jnp.float32)
    h_ids = h_ids.astype(jnp.float32)
    w_ids = w_ids.astype(jnp.float32)
    if grid_size is not None:
        h_ids = h_ids * (grid_size / h_patches)
        w_ids = w_ids * (grid_size / w_patches)
    parts = [rope_angles(ids, dim, theta) for ids, dim in
             ((d_ids, d_dim), (h_ids, h_dim), (w_ids, w_dim))]
    cos = jnp.concatenate([p[0] for p in parts], axis=-1)
    sin = jnp.concatenate([p[1] for p in parts], axis=-1)
    return cos, sin


def apply_rope_cache(x: jnp.ndarray, cache: tuple) -> jnp.ndarray:
    """Apply a precomputed rope cache to q or k of shape [B, N, H, Dh].

    The rotated width comes from the (static) cos shape, so the cache stays
    remat/jit-transparent."""
    cos, sin = cache
    rot = cos.shape[-1]
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    sub = x[..., :rot]
    rotated = (sub * cos + rotate_pairs(sub) * sin).astype(x.dtype)
    if rot < x.shape[-1]:
        return jnp.concatenate([rotated, x[..., rot:]], axis=-1)
    return rotated


def apply_rope_1d(x: jnp.ndarray, pos_ids: jnp.ndarray, dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Rotate only the first ``dim`` features of [B, N, H, Dh] by temporal ids.

    Used for action/state conditioning tokens in the AC predictor
    (reference `modules.py:190-195` rotates only the depth subspace).
    """
    cos, sin = rope_angles(pos_ids.astype(jnp.float32), dim, theta)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    sub = x[..., :dim]
    rotated = (sub * cos + rotate_pairs(sub) * sin).astype(sub.dtype)
    return jnp.concatenate([rotated, x[..., dim:]], axis=-1)
