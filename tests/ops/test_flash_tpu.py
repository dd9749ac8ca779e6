"""Hardware-gated flash attention tests (reference pattern: the CUDA-gated
RoPE tests in `tests/models/test_vision_transformer.py:17-63` —
`pytest.mark.skipif(not torch.cuda.is_available())`). These run ONLY when
a real TPU backend is attached; on CPU CI they skip, and interpret-mode
parity lives in `test_flash_attention.py`.

Keep shapes small-but-legal (N multiple of 8, pays one ~20-40 s Mosaic
compile on first run; the persistent cache makes reruns cheap).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tpu_attached() -> bool:
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or getattr(d, "device_kind", "").startswith("TPU")
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu_attached(), reason="no TPU attached")


def test_flash_matches_xla_on_device():
    from vjepa2_tpu.ops.attention import attend
    from vjepa2_tpu.ops.flash_attention import flash_attention
    from vjepa2_tpu.ops.rope import build_rope_cache

    B, N, H, D = 2, 512, 4, 64
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, 16, 16)
    ref = attend(q, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32)
    got = flash_attention(q, k, v, rope_tables=cache, block_q=256, block_k=256
                          ).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(got - ref))) < 0.05


def test_flash_grad_on_device():
    from vjepa2_tpu.ops.attention import attend
    from vjepa2_tpu.ops.flash_attention import flash_attention

    B, N, H, D = 1, 256, 2, 32
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)

    def loss_flash(qkv):
        return flash_attention(*qkv, block_q=128, block_k=128
                               ).astype(jnp.float32).sum()

    def loss_ref(qkv):
        return attend(*qkv, use_flash=False).astype(jnp.float32).sum()

    g1 = jax.grad(loss_flash)((q, k, v))
    g2 = jax.grad(loss_ref)((q, k, v))
    for a, b, name in zip(g1, g2, "qkv"):
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        assert err < 0.25, (name, err)  # bf16 inputs; grads accumulate error


def test_flash_dn_on_device():
    """DN-layout narrow-head family at the REAL predictor shape class:
    N=1664 (the x128 stack-pad of ctx+pred 1623), kv_valid tail mask, RoPE.
    This is the shape whose lane-dim block plan ((bq=N, bk=128) — blocks
    must be x128 or array-equal in DN layout) failed to lower when the
    picker used the sublane rule; fwd AND grad must lower and match the
    XLA fallback math."""
    from vjepa2_tpu.ops.attention import attend_bhdn
    from vjepa2_tpu.ops.flash_attention import expand_rope_cache
    from vjepa2_tpu.ops.flash_attention_dn import flash_attention_bhdn, supports_dn
    from vjepa2_tpu.ops.rope import build_rope_cache

    B, H, D, N, valid = 1, 12, 32, 1664, 1623
    assert supports_dn(N, D)
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(B, H, D, N), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, H, D, N), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, D, N), jnp.bfloat16)
    cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, 16, 16)
    rope, perm = expand_rope_cache(cache, D)
    perm = jnp.asarray(perm)
    qp = jnp.take(q, perm, axis=2)  # q/k arrive split-half-permuted
    kp = jnp.take(k, perm, axis=2)

    def loss_dn(args):
        qp, kp, v = args
        out = flash_attention_bhdn(qp, kp, v, rope_expanded=rope,
                                   kv_valid_len=valid)
        return out.astype(jnp.float32)[..., :valid].sum()

    def loss_ref(args):
        qp, kp, v = args
        out = attend_bhdn(qp, kp, v, rope_expanded=rope, use_flash=False,
                          kv_valid=valid)
        return out.astype(jnp.float32)[..., :valid].sum()

    l1, g1 = jax.value_and_grad(loss_dn)((qp, kp, v))
    l2, g2 = jax.value_and_grad(loss_ref)((qp, kp, v))
    assert abs(float(l1) - float(l2)) / max(abs(float(l2)), 1.0) < 2e-2
    for a, b, name in zip(g1, g2, ("q", "k", "v")):
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        assert err < 0.25, (name, err)


def test_fused_layernorm_on_device():
    from vjepa2_tpu.ops.layernorm import layer_norm

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(8, 256, 1024), jnp.bfloat16)
    g = jnp.asarray(rs.rand(1024) + 0.5, jnp.float32)
    b = jnp.asarray(rs.randn(1024) * 0.1, jnp.float32)
    got = layer_norm(x, g, b).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    xc = xf - mean
    ref = (xc * jax.lax.rsqrt((xc * xc).mean(-1, keepdims=True) + 1e-6) * g + b)
    err = float(jnp.max(jnp.abs(got - ref.astype(jnp.bfloat16).astype(jnp.float32))))
    assert err < 0.05, err
    # gradient path executes
    jax.grad(lambda x: layer_norm(x, g, b).astype(jnp.float32).sum())(x)


def test_ln_qkv_prologue_on_device():
    """Fused LN+QKV(+RoPE) prologue kernel vs its XLA formulation on real
    hardware (interpret-mode parity lives in test_ln_qkv.py)."""
    from vjepa2_tpu.ops import ln_qkv as lq

    rs = np.random.RandomState(5)
    B, N, C, H, D = 2, 256, 512, 8, 64
    x = jnp.asarray(rs.randn(B, N, C), jnp.bfloat16)
    gamma = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    w = jnp.asarray(rs.randn(C, 3 * H * D) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rs.randn(3 * H * D) * 0.02, jnp.float32)
    ang = rs.rand(1, N, D) * 6.28
    rope = (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))
    assert lq.supports(B, N, C, H, D), "gate must hold for this shape"
    got = lq.ln_qkv(x, gamma, beta, w, bias, rope=rope, num_heads=H, head_dim=D)
    ref = lq._xla_reference(x, gamma, beta, w, bias, rope, 1e-6, H, D)
    for g, r, name in zip(got, ref, "qkv"):
        err = float(jnp.max(jnp.abs(g.astype(jnp.float32) - r.astype(jnp.float32))))
        assert err < 0.05, (name, err)
    # gradient path executes on device
    jax.grad(lambda x: sum(t.astype(jnp.float32).sum() for t in lq.ln_qkv(
        x, gamma, beta, w, bias, rope=rope, num_heads=H, head_dim=D)))(x)


def test_ln_mlp_prologue_on_device():
    """Fused LN+fc1+GELU prologue on real hardware — also proves Mosaic
    lowers `lax.erf` (the exact-GELU dependency)."""
    from vjepa2_tpu.ops import ln_mlp as lm

    rs = np.random.RandomState(6)
    B, N, C, hidden = 2, 256, 512, 2048
    x = jnp.asarray(rs.randn(B, N, C), jnp.bfloat16)
    gamma = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    w = jnp.asarray(rs.randn(C, hidden) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rs.randn(hidden) * 0.02, jnp.float32)
    assert lm.supports(B, N, C, hidden), "gate must hold for this shape"
    got = lm.ln_mlp(x, gamma, beta, w, bias).astype(jnp.float32)
    ref = lm._xla_reference(x, gamma, beta, w, bias, 1e-6).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.05, err
    jax.grad(lambda x: lm.ln_mlp(x, gamma, beta, w, bias)
             .astype(jnp.float32).sum())(x)


def test_tiny_flash_train_step_runs():
    """One masked-pretrain step with use_flash on the device — covers the
    attend() padding dispatch and the custom VJP inside a real jit."""
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, make_optimizer,
        make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    B, T, S = 1, 4, 64
    encoder, predictor = build_models(
        model_name="vit_tiny", crop_size=S, num_frames=T,
        pred_depth=2, pred_embed_dim=64, pred_num_heads=2,
        use_rope=True, num_mask_tokens=1, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(
        [{"spatial_scale": (0.6, 0.6), "temporal_scale": (1.0, 1.0),
          "aspect_ratio": (1.0, 1.0), "num_blocks": 1}],
        dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(ipe=10, epochs=1)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]), jnp.asarray(mp[0]))
    state = TrainState.create(params, target, tx)
    step = jax.jit(make_train_step(encoder, predictor, tx, hp), donate_argnums=(0,))
    clips = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3), jnp.bfloat16)
    state, m = step(state, clips, tuple(map(jnp.asarray, me)), tuple(map(jnp.asarray, mp)))
    loss = float(m["loss"])
    assert np.isfinite(loss) and loss > 0
