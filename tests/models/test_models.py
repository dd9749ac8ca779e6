"""ViT encoder shape tests (mirrors reference `tests/models/test_models.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.models.vision_transformer import vit_tiny


@pytest.fixture(scope="module")
def video_model():
    m = vit_tiny(img_size=(64, 64), num_frames=8, tubelet_size=2)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 64, 64, 3)))
    return m, params


@pytest.fixture(scope="module")
def image_model():
    m = vit_tiny(img_size=(64, 64), num_frames=1)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    return m, params


@pytest.mark.parametrize("batch", [1, 4])
def test_video_forward(video_model, batch):
    m, params = video_model
    x = jnp.ones((batch, 8, 64, 64, 3))
    out = m.apply(params, x)
    assert out.shape == (batch, 4 * 4 * 4, 192)


@pytest.mark.parametrize("batch", [1, 4])
def test_image_forward(image_model, batch):
    m, params = image_model
    x = jnp.ones((batch, 64, 64, 3))
    out = m.apply(params, x)
    assert out.shape == (batch, 4 * 4, 192)


def test_video_forward_with_masks(video_model):
    m, params = video_model
    B, K = 2, 17
    x = jnp.ones((B, 8, 64, 64, 3))
    mask = jnp.asarray(np.sort(np.random.RandomState(0).choice(64, size=(B, K), replace=False)))
    out = m.apply(params, x, [mask])
    assert out.shape == (B, K, 192)
    # two masks -> stacked along batch
    out2 = m.apply(params, x, [mask, mask])
    assert out2.shape == (2 * B, K, 192)


def test_rope_model_mask_consistency():
    """Masked forward == full forward gathered at mask indices is NOT expected
    (attention context differs), but masked tokens must depend only on their
    positions: permuting the mask permutes outputs accordingly."""
    m = vit_tiny(img_size=(64, 64), num_frames=8, tubelet_size=2, use_rope=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 64, 64, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    idx = np.random.RandomState(1).choice(64, size=20, replace=False)
    m1 = jnp.asarray(idx[None, :])
    perm = np.random.RandomState(2).permutation(20)
    m2 = jnp.asarray(idx[perm][None, :])
    y1 = m.apply(params, x, [m1])
    y2 = m.apply(params, x, [m2])
    np.testing.assert_allclose(np.asarray(y1)[0, perm], np.asarray(y2)[0], atol=1e-4)


def test_variable_resolution_sincos_interpolation(video_model):
    m, params = video_model
    # different spatial size than init (sincos path interpolates)
    out = m.apply(params, jnp.ones((1, 8, 96, 96, 3)))
    assert out.shape == (1, 4 * 6 * 6, 192)
    # shorter clip: chop-early-frames path
    out = m.apply(params, jnp.ones((1, 4, 64, 64, 3)))
    assert out.shape == (1, 2 * 4 * 4, 192)


def test_out_layers():
    m = vit_tiny(img_size=(32, 32), num_frames=4, tubelet_size=2, out_layers=(10, 11))
    x = jnp.ones((2, 4, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].shape == (2, 2 * 2 * 2, 192)
