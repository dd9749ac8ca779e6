"""Model-level flash-attention integration: the `attend` dispatch inside
Attention/ACAttention produces the same outputs with the Pallas kernel
(interpret mode) as with the XLA path — RoPE fusion and frame-causal
segment ids included."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
from vjepa2_tpu.models.vision_transformer import vit_tiny


def test_encoder_flash_matches_xla():
    S, T = 64, 4  # 2x4x4 = 32 tokens -> blocks clamp to N
    enc = vit_tiny(img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True)
    enc_flash = vit_tiny(
        img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True, use_flash=True
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, T, S, S, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    ref = enc.apply(params, x)
    with pltpu.force_tpu_interpret_mode():
        out = enc_flash.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ac_predictor_flash_matches_xla():
    S, Tf = 64, 4
    common = dict(
        img_size=(S, S), patch_size=16, num_frames=8, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=96, depth=2, num_heads=4,
    )
    pred = vit_ac_predictor(**common)
    pred_flash = vit_ac_predictor(**common, use_flash=True)
    rs = np.random.RandomState(1)
    gh = S // 16
    x = jnp.asarray(rs.rand(2, Tf * gh * gh, 64), jnp.float32)
    actions = jnp.asarray(rs.rand(2, Tf, 7) * 0.1, jnp.float32)
    states = jnp.asarray(rs.rand(2, Tf, 7), jnp.float32)
    params = pred.init(jax.random.PRNGKey(0), x, actions, states)
    ref = pred.apply(params, x, actions, states)
    with pltpu.force_tpu_interpret_mode():
        out = pred_flash.apply(params, x, actions, states)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=2e-4)


def test_ac_predictor_dn_route_matches_xla():
    """DN-eligible AC predictor (Dh=32): frame-causal segments ride the
    narrow-head [B, H, D, N] kernels (rope hoist + folded head perm), with
    the lane pad (N=72 -> 128) handled by `attend_bhdn`. Matches the
    flash-off XLA path."""
    import vjepa2_tpu.ops.flash_attention_dn as fdn

    S, Tf = 64, 4
    common = dict(
        img_size=(S, S), patch_size=16, num_frames=8, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=128, depth=2, num_heads=4,
    )  # Dh = 32: dn-eligible
    pred = vit_ac_predictor(**common)
    pred_flash = vit_ac_predictor(**common, use_flash=True)
    rs = np.random.RandomState(3)
    gh = S // 16
    x = jnp.asarray(rs.rand(2, Tf * gh * gh, 64), jnp.float32)
    actions = jnp.asarray(rs.rand(2, Tf, 7) * 0.1, jnp.float32)
    states = jnp.asarray(rs.rand(2, Tf, 7), jnp.float32)
    params = pred.init(jax.random.PRNGKey(0), x, actions, states)
    ref = pred.apply(params, x, actions, states)
    calls = []
    orig = fdn.flash_attention_bhdn
    fdn.flash_attention_bhdn = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        with pltpu.force_tpu_interpret_mode():
            out = pred_flash.apply(params, x, actions, states)
    finally:
        fdn.flash_attention_bhdn = orig
    assert calls, "AC predictor did not dispatch the DN segment kernel"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=2e-4)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
