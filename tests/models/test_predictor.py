"""Predictor shape/behaviour tests (mirrors reference `tests/models/test_predictor.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
from vjepa2_tpu.models.predictor import vit_predictor


@pytest.mark.parametrize("use_rope", [False, True])
def test_predictor_shapes(use_rope):
    B, Nc, Np, E = 2, 40, 24, 192
    m = vit_predictor(
        img_size=(64, 64),
        num_frames=8,
        tubelet_size=2,
        embed_dim=E,
        predictor_embed_dim=128,
        depth=2,
        num_heads=4,
        use_mask_tokens=True,
        num_mask_tokens=2,
        use_rope=use_rope,
    )
    rng = np.random.RandomState(0)
    perm = rng.permutation(64)
    mx = jnp.asarray(np.sort(perm[:Nc])[None].repeat(B, 0))
    my = jnp.asarray(np.sort(perm[Nc : Nc + Np])[None].repeat(B, 0))
    x = jnp.asarray(rng.rand(B, Nc, E), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, mx, my, 0)
    out = m.apply(params, x, mx, my, 0)
    assert out.shape == (B, Np, E)
    # different mask token index -> different prediction (tokens zero-init, so
    # use non-zero init to see the difference)
    m2 = m.clone(zero_init_mask_tokens=False)
    params2 = m2.init(jax.random.PRNGKey(1), x, mx, my, 0)
    y0 = m2.apply(params2, x, mx, my, 0)
    y1 = m2.apply(params2, x, mx, my, 1)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-6


def test_ac_predictor_shapes():
    B, T, gh, gw, E = 2, 3, 4, 4, 96
    m = vit_ac_predictor(
        img_size=(64, 64),
        patch_size=16,
        num_frames=2 * T,
        tubelet_size=2,
        embed_dim=E,
        predictor_embed_dim=128,
        depth=2,
        num_heads=4,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, T * gh * gw, E), jnp.float32)
    actions = jnp.asarray(rng.rand(B, T, 7), jnp.float32)
    states = jnp.asarray(rng.rand(B, T, 7), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, actions, states)
    out = m.apply(params, x, actions, states)
    assert out.shape == (B, T * gh * gw, E)


def test_ac_predictor_causality():
    """Changing frame t's tokens/actions must not change predictions for frames < t."""
    B, T, gh, gw, E = 1, 3, 2, 2, 64
    m = vit_ac_predictor(
        img_size=(32, 32),
        patch_size=16,
        num_frames=2 * T,
        tubelet_size=2,
        embed_dim=E,
        predictor_embed_dim=64,
        depth=2,
        num_heads=2,
    )
    rng = np.random.RandomState(0)
    HW = gh * gw
    x = jnp.asarray(rng.rand(B, T * HW, E), jnp.float32)
    actions = jnp.asarray(rng.rand(B, T, 7), jnp.float32)
    states = jnp.asarray(rng.rand(B, T, 7), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, actions, states)
    y0 = m.apply(params, x, actions, states)
    x2 = x.at[:, -HW:, :].add(1.0)
    a2 = actions.at[:, -1].add(1.0)
    y1 = m.apply(params, x2, a2, states)
    np.testing.assert_allclose(
        np.asarray(y0[:, : (T - 1) * HW]), np.asarray(y1[:, : (T - 1) * HW]), atol=1e-5
    )
