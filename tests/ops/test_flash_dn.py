"""DN-layout ([B, H, D, N]) narrow-head flash parity (interpret mode on CPU).

Reference math: transpose to BHND, split-half-rotate in XLA, dense softmax
with the kv_valid tail mask — the exact semantics `attend_bhnd`'s XLA
fallback implements."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.ops import flash_attention as fa
from vjepa2_tpu.ops.flash_attention_dn import (
    flash_attention_bhdn,
    supports_dn,
)

B, H, D = 2, 3, 32


def _qkv_dn(N=256, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(B, H, D, N), dtype) for _ in range(3)
    )


def _rope(N, seed=9):
    rng = np.random.RandomState(seed)
    cos = jnp.asarray(rng.uniform(-1, 1, (1, N, D)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, (1, N, D)), jnp.float32)
    return cos, sin


def _ref(q, k, v, rope=None, kv_valid=None):
    """Dense reference on the transposed ([B, H, N, D]) operands."""
    qn, kn, vn = (jnp.swapaxes(t, 2, 3).astype(jnp.float32) for t in (q, k, v))
    if rope is not None:
        cos, sin = rope  # [1, N, D] split-half
        qn = fa._rope_rotate(qn, cos[:, None], sin[:, None])
        kn = fa._rope_rotate(kn, cos[:, None], sin[:, None])
    s = jnp.einsum("bhnd,bhmd->bhnm", qn, kn) / (D**0.5)
    if kv_valid is not None:
        cols = jnp.arange(s.shape[-1])
        s = jnp.where(cols[None, None, None, :] < kv_valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", p, vn)
    return jnp.swapaxes(out, 2, 3)


def test_dn_fwd_matches_dense():
    q, k, v = _qkv_dn()
    ref = _ref(q, k, v)
    out = flash_attention_bhdn(q, k, v, block_q=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_dn_fwd_rope_kv_valid():
    N, valid = 256, 199
    q, k, v = _qkv_dn(N, seed=1)
    rope = _rope(N)
    ref = _ref(q, k, v, rope=rope, kv_valid=valid)
    out = flash_attention_bhdn(q, k, v, rope_expanded=rope, kv_valid_len=valid,
                               block_q=128, block_k=64, interpret=True)
    # pad QUERY columns (>= valid) attend to everything in the kernel but
    # are sliced off by the model; compare the real region only
    np.testing.assert_allclose(np.asarray(out)[..., :valid],
                               np.asarray(ref)[..., :valid],
                               atol=2e-5, rtol=1e-4)


def test_dn_fwd_rope_tables_transposed_input():
    """[B|1, D, N] tables accepted directly (the hoisted-transpose path)."""
    N = 128
    q, k, v = _qkv_dn(N, seed=2)
    cos, sin = _rope(N)
    ref = _ref(q, k, v, rope=(cos, sin))
    rope_dn = (jnp.swapaxes(cos, 1, 2), jnp.swapaxes(sin, 1, 2))
    out = flash_attention_bhdn(q, k, v, rope_expanded=rope_dn,
                               block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("use_rope,kv_valid", [(False, None), (True, 199)])
def test_dn_grads_match_dense(use_rope, kv_valid):
    N = 256
    q, k, v = _qkv_dn(N, seed=3)
    rope = _rope(N, seed=11) if use_rope else None
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(B, H, D, N), jnp.float32)
    if kv_valid is not None:
        # zero cotangent on pad q columns (the model slices them off)
        w = w * (jnp.arange(N)[None, None, None, :] < kv_valid)

    def loss_kernel(q, k, v):
        out = flash_attention_bhdn(q, k, v, rope_expanded=rope,
                                   kv_valid_len=kv_valid,
                                   block_q=128, block_k=64, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, rope=rope, kv_valid=kv_valid) * w)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=5e-5, rtol=5e-4, err_msg=f"d{name}")


def test_dn_matches_bhnd_kernel():
    """The two kernel families agree on the same (transposed) problem."""
    N = 256
    q, k, v = _qkv_dn(N, seed=6)
    out_dn = flash_attention_bhdn(q, k, v, block_q=128, block_k=128,
                                  interpret=True)
    out_nd = fa.flash_attention_bhnd(
        jnp.swapaxes(q, 2, 3), jnp.swapaxes(k, 2, 3), jnp.swapaxes(v, 2, 3),
        block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out_dn),
                               np.asarray(jnp.swapaxes(out_nd, 2, 3)),
                               atol=2e-5, rtol=1e-4)


def test_predictor_forward_rides_dn_kernel():
    """Model-level: the pretrain predictor (Dh=32) under interpret mode runs
    the DN kernels end to end (projection -> flash -> out-proj) and matches
    the flash-off XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from vjepa2_tpu.models import modules as M
    from vjepa2_tpu.models.predictor import vit_predictor

    kw = dict(img_size=(32, 32), patch_size=16, num_frames=4, tubelet_size=2,
              embed_dim=48, predictor_embed_dim=64, depth=2, num_heads=2,
              use_mask_tokens=True, num_mask_tokens=2, use_rope=True)
    flash = vit_predictor(use_flash=True, **kw)
    plain = vit_predictor(use_flash=False, **kw)
    rs = np.random.RandomState(7)
    z = jnp.asarray(rs.randn(2, 5, 48), jnp.float32)
    mx = jnp.asarray([[0, 2, 3, 5, 6], [1, 2, 4, 6, 7]])
    my = jnp.asarray([[1, 4, 7], [0, 3, 5]])
    params = plain.init(jax.random.PRNGKey(0), z, mx, my, 0)
    ref = plain.apply(params, z, mx, my, 0)
    import vjepa2_tpu.ops.flash_attention_dn as fdn

    calls = []
    orig = fdn.flash_attention_bhdn
    narrow_dn = M.NARROW_DN
    M.NARROW_DN = True  # default-off A/B knob; this test exercises the DN path
    fdn.flash_attention_bhdn = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        with pltpu.force_tpu_interpret_mode():
            out = flash.apply(params, z, mx, my, 0)
    finally:
        fdn.flash_attention_bhdn = orig
        M.NARROW_DN = narrow_dn
    assert calls, "DN kernel was not dispatched (gate regressed to fallback)"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_supports_dn_gates():
    import vjepa2_tpu.ops.flash_attention_dn as fdn

    fa_dn_avail = fa.FORCE_MOSAIC_AVAILABLE
    fa.FORCE_MOSAIC_AVAILABLE = True
    try:
        assert supports_dn(1664, 32)
        assert supports_dn(1664, 64)       # encoder widths ride DN (dn64 A/B)
        assert supports_dn(2048, 64)
        assert not supports_dn(2048, 80)   # wider than the routing bound
        assert not supports_dn(1664, 24)   # split-half needs 8-aligned halves
        assert not supports_dn(1661, 32)   # unaligned N
        # the routing bound is a knob: 48 restores the predictor-only route
        orig_max_d = fdn.DN_MAX_D
        fdn.DN_MAX_D = 48
        try:
            assert supports_dn(1664, 32)
            assert not supports_dn(2048, 64)
        finally:
            fdn.DN_MAX_D = orig_max_d
    finally:
        fa.FORCE_MOSAIC_AVAILABLE = fa_dn_avail


def test_dn_d64_fwd_grads_match_dense():
    """Encoder-width (D=64) DN parity — the dn64 A/B variant's math."""
    N, D64 = 256, 64
    rng = np.random.RandomState(13)
    q, k, v = (jnp.asarray(rng.randn(B, H, D64, N), jnp.float32)
               for _ in range(3))
    cos = jnp.asarray(rng.uniform(-1, 1, (1, N, D64)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, (1, N, D64)), jnp.float32)
    w = jnp.asarray(rng.randn(B, H, D64, N), jnp.float32)

    def _ref64(q, k, v):
        qn, kn, vn = (jnp.swapaxes(t, 2, 3).astype(jnp.float32)
                      for t in (q, k, v))
        qn = fa._rope_rotate(qn, cos[:, None], sin[:, None])
        kn = fa._rope_rotate(kn, cos[:, None], sin[:, None])
        s = jnp.einsum("bhnd,bhmd->bhnm", qn, kn) / (D64**0.5)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.swapaxes(jnp.einsum("bhnm,bhmd->bhnd", p, vn), 2, 3)

    def loss_kernel(q, k, v):
        out = flash_attention_bhdn(q, k, v, rope_expanded=(cos, sin),
                                   block_q=128, block_k=128, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref64(q, k, v) * w)

    out = flash_attention_bhdn(q, k, v, rope_expanded=(cos, sin),
                               block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref64(q, k, v)),
                               atol=2e-5, rtol=1e-4)
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=5e-5, rtol=5e-4, err_msg=f"d{name}")


def _ref_seg(q, k, v, seg, rope=None):
    """Dense reference with the seg_q >= seg_k rule ([N] or [B, N] ids)."""
    qn, kn, vn = (jnp.swapaxes(t, 2, 3).astype(jnp.float32) for t in (q, k, v))
    if rope is not None:
        cos, sin = rope
        qn = fa._rope_rotate(qn, cos[:, None], sin[:, None])
        kn = fa._rope_rotate(kn, cos[:, None], sin[:, None])
    d = q.shape[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", qn, kn) / (d**0.5)
    sq = seg if seg.ndim > 1 else seg[None]
    mask = sq[:, None, :, None] >= sq[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", p, vn)
    return jnp.swapaxes(out, 2, 3)


@pytest.mark.parametrize("batched", [False, True])
def test_dn_segments_fwd(batched):
    """Frame-causal segment masking (the AC predictor's rule) on the DN
    kernel: shared [N] and per-batch [B, N] ids, fp32 row+column side
    inputs (no outer-product trick needed in this layout)."""
    N = 256
    q, k, v = _qkv_dn(N, seed=8)
    rng = np.random.RandomState(21)
    if batched:
        seg = jnp.asarray(rng.randint(0, 4, (B, N)), jnp.int32)
    else:
        seg = jnp.asarray(np.repeat(np.arange(4), N // 4), jnp.int32)
    ref = _ref_seg(q, k, v, seg)
    out = flash_attention_bhdn(q, k, v, segment_ids=seg,
                               block_q=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_dn_segments_rope_grads():
    """Segments + fused RoPE through the fused one-pass backward."""
    N = 256
    q, k, v = _qkv_dn(N, seed=9)
    rope = _rope(N, seed=22)
    seg = jnp.asarray(np.repeat(np.arange(4), N // 4), jnp.int32)
    rng = np.random.RandomState(23)
    w = jnp.asarray(rng.randn(B, H, D, N), jnp.float32)

    def loss_kernel(q, k, v):
        out = flash_attention_bhdn(q, k, v, rope_expanded=rope,
                                   segment_ids=seg,
                                   block_q=128, block_k=64, interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_seg(q, k, v, seg, rope=rope) * w)

    out = flash_attention_bhdn(q, k, v, rope_expanded=rope, segment_ids=seg,
                               block_q=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_seg(q, k, v, seg, rope=rope)),
                               atol=2e-5, rtol=1e-4)
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=5e-5, rtol=5e-4, err_msg=f"d{name}")


def test_dn_segments_padded_dispatch():
    """`attend_bhdn` pads lane-illegal N (e.g. the AC teacher-forcing 1806)
    to x128 with int32-max pad-key ids and slices the pad columns off."""
    from vjepa2_tpu.models import modules as M
    from vjepa2_tpu.ops.attention import attend_bhdn

    N = 72 * 3  # 216: not x128 -> pads to 256
    q, k, v = _qkv_dn(N, seed=10)
    seg = jnp.asarray(np.repeat(np.arange(3), 72), jnp.int32)
    ref = _ref_seg(q, k, v, seg)
    from jax.experimental.pallas import tpu as pltpu

    import vjepa2_tpu.ops.flash_attention_dn as fdn

    calls = []
    orig = fdn.flash_attention_bhdn
    fdn.flash_attention_bhdn = lambda *a, **k: calls.append(1) or orig(
        *a, **{**k, "interpret": True})
    try:
        with pltpu.force_tpu_interpret_mode():
            out = attend_bhdn(q, k, v, use_flash=True, segment_ids=seg)
    finally:
        fdn.flash_attention_bhdn = orig
    assert calls, "padded segment dispatch did not reach the DN kernel"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
