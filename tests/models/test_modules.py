"""Unit tests for transformer building blocks.

Includes a from-scratch torch re-derivation of the reference RoPE math
(tiled frequencies + interleaved pair rotation) as a golden check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.models.modules import ACAttention, ACBlock, Attention, Block, SwiGLUFFN
from vjepa2_tpu.ops.rope import rope_angles, rotate_pairs, rotate_queries_or_keys, separate_positions


def test_rope_angles_tiled():
    pos = jnp.array([0.0, 1.0, 2.0])
    cos, sin = rope_angles(pos, 4)
    # tiled: freq j uses omega[j % 2]
    omega = np.array([1.0, 1.0 / 10000 ** (1 / 2)])
    expect_cos = np.cos(np.outer([0, 1, 2], np.concatenate([omega, omega])))
    np.testing.assert_allclose(np.asarray(cos), expect_cos, rtol=1e-6)
    assert cos.shape == (3, 4)


def test_rotate_pairs():
    x = jnp.arange(6.0).reshape(1, 6)
    y = rotate_pairs(x)
    np.testing.assert_allclose(np.asarray(y)[0], [-1, 0, -3, 2, -5, 4])


def test_rope_matches_reference_formula():
    """Golden check vs an independent numpy transcription of reference
    `modules.py:26-50` (tiled cos/sin, interleaved pair rotation)."""
    rng = np.random.RandomState(0)
    B, H, N, D = 2, 3, 5, 8
    x = rng.randn(B, H, N, D).astype(np.float32)
    pos = rng.randint(0, 17, size=(B, H, N)).astype(np.float32)

    omega = 1.0 / 10000 ** (np.arange(D // 2) / (D / 2))
    freq = pos[..., None] * omega  # (B,H,N,D/2)
    sin = np.tile(np.sin(freq), (1, 1, 1, 2))
    cos = np.tile(np.cos(freq), (1, 1, 1, 2))
    y = x.reshape(B, H, N, D // 2, 2)
    rot = np.stack([-y[..., 1], y[..., 0]], axis=-1).reshape(B, H, N, D)
    expected = x * cos + rot * sin

    got = rotate_queries_or_keys(jnp.asarray(x), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_separate_positions():
    ids = jnp.array([0, 1, 5, 7, 12, 23])
    d, h, w = separate_positions(ids, 2, 3)  # frames of 6 tokens, rows of 3
    np.testing.assert_array_equal(np.asarray(d), [0, 0, 0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(h), [0, 0, 1, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(w), [0, 1, 2, 1, 0, 2])


def test_swiglu_hidden_rounding():
    m = SwiGLUFFN(hidden_dim=768)  # 2*768/3 = 512, already aligned
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 192)))
    assert params["params"]["fc1"]["kernel"].shape == (192, 512)
    m2 = SwiGLUFFN(hidden_dim=100)  # 66 -> 72
    params2 = m2.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 32)))
    assert params2["params"]["fc1"]["kernel"].shape == (32, 72)


@pytest.mark.parametrize("use_rope", [False, True])
def test_block_shapes(use_rope):
    blk = Block(dim=64, num_heads=4, use_rope=use_rope)
    x = jnp.ones((2, 24, 64))
    pos = jnp.tile(jnp.arange(24), (2, 1)) if use_rope else None
    params = blk.init(jax.random.PRNGKey(0), x, pos, None, 4, 3)
    y = blk.apply(params, x, pos, None, 4, 3)
    assert y.shape == x.shape


def test_ac_attention_frame_causal():
    """A perturbation in frame t must not affect outputs at frames < t."""
    T, HW, A, D = 3, 4, 2, 32
    N = T * (A + HW)
    blk = ACBlock(dim=D, num_heads=2, grid_size=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, N, D).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, T, 2, 2, A)
    y0 = blk.apply(params, x, T, 2, 2, A)
    # perturb last frame group
    x2 = x.at[:, -(A + HW) :, :].add(1.0)
    y1 = blk.apply(params, x2, T, 2, 2, A)
    first_two = slice(0, 2 * (A + HW))
    np.testing.assert_allclose(np.asarray(y0[:, first_two]), np.asarray(y1[:, first_two]), atol=1e-5)
    # and the last frame DOES change
    assert np.abs(np.asarray(y0[:, -(A + HW) :]) - np.asarray(y1[:, -(A + HW) :])).max() > 1e-3


def test_attention_rope_positions_matter():
    attn = Attention(dim=48, num_heads=3, use_rope=True)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 48).astype(np.float32))
    p1 = jnp.arange(8)[None, :]
    p2 = (jnp.arange(8) * 3)[None, :]
    params = attn.init(jax.random.PRNGKey(0), x, p1, None, 4, 4)
    y1 = attn.apply(params, x, p1, None, 4, 4)
    y2 = attn.apply(params, x, p2, None, 4, 4)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-4
