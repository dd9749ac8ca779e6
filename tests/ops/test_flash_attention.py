"""Pallas flash-attention parity (interpret mode on CPU).

Covers the full kernel family against the XLA sdpa reference: plain,
token-causal, segment-id (frame-causal), fused-RoPE (incl. partial-rotation
heads), multi-k-block streaming, and the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.ops.attention import sdpa
from vjepa2_tpu.ops.flash_attention import (
    expand_rope_tables,
    flash_attention,
    supports,
)
from vjepa2_tpu.ops.rope import apply_rope_cache, build_rope_cache


def _qkv(B=2, N=256, H=3, D=64, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(B, N, H, D), jnp.float32) for _ in range(3)
    )


def test_flash_matches_xla():
    q, k, v = _qkv()
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_causal():
    q, k, v = _qkv(N=128, seed=1)
    ref = sdpa(q, k, v, is_causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=64, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_segment_ids_frame_causal():
    """Frame-causal via per-token segment ids (AC predictor mask family)."""
    B, N, H, D = 2, 128, 2, 32
    q, k, v = _qkv(B, N, H, D, seed=2)
    # 4 frames x 32 tokens, like interleaved cond+patch tokens
    seg = jnp.tile(jnp.repeat(jnp.arange(4, dtype=jnp.int32), 32)[None], (B, 1))
    bool_mask = seg[:, None, :, None] >= seg[:, None, None, :]  # [B,1,N,N]
    ref = sdpa(q, k, v, attn_mask=bool_mask)
    out = flash_attention(q, k, v, segment_ids=seg, block_q=64, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("D", [64, 32])  # 64 -> rot 60 (tail), 32 -> rot 30
def test_flash_fused_rope(D):
    """In-kernel RoPE == rotate-then-attend with the model's interleaved
    convention, including the unrotated tail of the head dim."""
    B, N, H = 2, 128, 2
    q, k, v = _qkv(B, N, H, D, seed=3)
    pos = jnp.asarray(np.sort(np.random.RandomState(4).choice(512, N, replace=False)))
    cache = build_rope_cache(pos, D, h_patches=8, w_patches=8)
    q_rot = apply_rope_cache(q, cache)
    k_rot = apply_rope_cache(k, cache)
    ref = sdpa(q_rot, k_rot, v)
    out = flash_attention(
        q, k, v, rope_tables=cache, block_q=64, block_k=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=2e-4)


def test_flash_rope_per_batch_tables():
    """[B, N, rot] tables (masked tokens: different positions per sample)."""
    B, N, H, D = 2, 64, 2, 32
    q, k, v = _qkv(B, N, H, D, seed=5)
    rng = np.random.RandomState(6)
    pos = jnp.asarray(
        np.stack([np.sort(rng.choice(256, N, replace=False)) for _ in range(B)])
    )
    cache = build_rope_cache(pos, D, h_patches=4, w_patches=4)
    ref = sdpa(apply_rope_cache(q, cache), apply_rope_cache(k, cache), v)
    out = flash_attention(q, k, v, rope_tables=cache, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=2e-4)


def test_flash_vjp():
    """Custom flash backward == XLA autodiff through the reference sdpa."""
    B, N, H, D = 1, 128, 2, 32
    q, k, v = _qkv(B, N, H, D, seed=7)
    w = jnp.asarray(np.random.RandomState(8).randn(B, N, H, D), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, block_q=64, block_k=32, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_vjp_twopass():
    """The separate dq / dkv backward kernels (used when the fused one-pass
    backward's partial buffers would be too big) match XLA autodiff —
    small test shapes dispatch to the fused path by default, so force the
    two-pass path explicitly."""
    from vjepa2_tpu.ops import flash_attention as fa

    B, N, H, D = 1, 128, 2, 32
    q, k, v = _qkv(B, N, H, D, seed=21)
    seg = jnp.tile(jnp.repeat(jnp.arange(4, dtype=jnp.int32), 32)[None], (B, 1))
    pos = jnp.arange(N)
    cache = build_rope_cache(pos, D, h_patches=8, w_patches=8)
    w = jnp.asarray(np.random.RandomState(22).randn(B, N, H, D), jnp.float32)
    bool_mask = seg[:, None, :, None] >= seg[:, None, None, :]

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, segment_ids=seg, rope_tables=cache,
                              block_q=64, block_k=32, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        out = sdpa(apply_rope_cache(q, cache), apply_rope_cache(k, cache), v,
                   attn_mask=bool_mask)
        return jnp.sum(out * w)

    old = fa._FUSED_BWD
    fa._FUSED_BWD = False
    jax.clear_caches()  # _flash_bwd_bhnd reads the flag at trace time
    try:
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._FUSED_BWD = old
        jax.clear_caches()
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_vjp_headpack():
    """block_h > 1 (several heads per grid cell) matches the reference
    forward and backward — keeps the in-kernel head loop covered now that
    the default is block_h=1."""
    B, N, H, D = 2, 64, 4, 32
    q, k, v = _qkv(B, N, H, D, seed=11)
    w = jnp.asarray(np.random.RandomState(12).randn(B, N, H, D), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, block_q=32, block_k=32, block_h=2,
                              interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v) * w)

    out = flash_attention(q, k, v, block_q=32, block_k=32, block_h=2,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sdpa(q, k, v)),
                               atol=3e-5, rtol=2e-4)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_vjp_rope_segments():
    """Backward with fused RoPE + frame-causal segments."""
    B, N, H, D = 1, 64, 2, 32
    q, k, v = _qkv(B, N, H, D, seed=9)
    seg = jnp.tile(jnp.repeat(jnp.arange(4, dtype=jnp.int32), 16)[None], (B, 1))
    pos = jnp.arange(N)
    cache = build_rope_cache(pos, D, h_patches=4, w_patches=4)
    w = jnp.asarray(np.random.RandomState(10).randn(B, N, H, D), jnp.float32)
    bool_mask = seg[:, None, :, None] >= seg[:, None, None, :]

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, segment_ids=seg, rope_tables=cache,
            block_q=32, block_k=32, interpret=True,
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        out = sdpa(apply_rope_cache(q, cache), apply_rope_cache(k, cache), v,
                   attn_mask=bool_mask)
        return jnp.sum(out * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_expand_rope_tables_roundtrip():
    """The split-half expansion preserves the rotation numerics exactly."""
    from vjepa2_tpu.ops.rope import rope_angles, rotate_pairs

    D, rot, N = 64, 60, 16
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(N, D), jnp.float32)
    pos = jnp.arange(N, dtype=jnp.float32)
    cos, sin = rope_angles(pos, rot)
    ref_sub = x[:, :rot] * cos + rotate_pairs(x[:, :rot]) * sin
    ref = jnp.concatenate([ref_sub, x[:, rot:]], axis=-1)

    cos_f, sin_f, perm = expand_rope_tables(cos, sin, D)
    xp = x[:, perm]
    half = D // 2
    rot_split = jnp.concatenate([-xp[:, half:], xp[:, :half]], axis=-1)
    got_perm = xp * cos_f + rot_split * sin_f
    # undo the permutation
    inv = np.argsort(perm)
    np.testing.assert_allclose(np.asarray(got_perm[:, inv]), np.asarray(ref), atol=1e-6)


def test_flash_bf16():
    q, k, v = _qkv(N=128, seed=12)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = sdpa(qb, kb, vb)
    out = flash_attention(qb, kb, vb, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_supports_gates():
    # off-TPU without forced interpret mode the gate is closed outright, so
    # use_flash=True is safe on any host (falls back to the XLA path)
    assert not supports(2048, 64, has_mask=False, is_causal=False)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        assert supports(2048, 64, has_mask=False, is_causal=False)
        assert supports(2048, 64, has_mask=True, is_causal=False)  # segment mask OK
        assert supports(2048, 64, has_mask=False, is_causal=True)  # token-causal OK
        # segments + causal together: the kernel would silently drop the causal
        # constraint (segments win in `_fwd_kernel`), so the gate rejects it
        assert not supports(2048, 64, has_mask=True, is_causal=True)
        assert supports(18432, 128, has_mask=False, is_causal=False)  # streaming: long seq
        assert not supports(100, 64, has_mask=False, is_causal=False)  # unaligned N
        assert not supports(2048, 63, has_mask=False, is_causal=False)  # odd head dim


def test_fwd_cap_override_scopes():
    """fwd_cap_override scopes FWD_CAP_WIDE around tracing and restores it,
    including on nesting and exceptions (forward-only programs — evals,
    serving export, encode bench — trace uncapped)."""
    from vjepa2_tpu.ops import flash_attention as fa

    saved = fa.FWD_CAP_WIDE
    with fa.fwd_cap_override(None):
        assert fa.FWD_CAP_WIDE is None
        with fa.fwd_cap_override((512, 512)):
            assert fa.FWD_CAP_WIDE == (512, 512)
        assert fa.FWD_CAP_WIDE is None
    assert fa.FWD_CAP_WIDE == saved
    try:
        with fa.fwd_cap_override(None):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert fa.FWD_CAP_WIDE == saved


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
