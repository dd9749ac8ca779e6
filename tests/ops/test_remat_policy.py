"""Saveable-residual flash structure + remat-policy behavior (VERDICT r5 #1).

Under block-level remat the custom-vjp residuals of the flash kernels are
opaque, so the bwd pass re-ran the forward kernel just to regenerate
(out, lse) — the dominant recompute at cooldown shapes (N=8192).
`ops/flash_attention.py:_flash_grad_attach` splits the call so (out, lse)
are ordinary jaxpr values tagged with `checkpoint_name`, which a
`save_only_these_names` policy can keep.

Pinned here:
  (a) gradient parity of the split structure vs the fused custom-vjp
      (interpret-mode kernels, both families);
  (b) the structural claim: with policy save_attn the grad-of-checkpoint
      jaxpr contains exactly as many pallas calls as the un-rematted grad
      (fwd kernel NOT recomputed), while full remat pays one extra fwd
      call per layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vjepa2_tpu.ops.flash_attention as fa
from vjepa2_tpu.models.modules import resolve_remat_policy
from vjepa2_tpu.ops.flash_attention import flash_attention
from vjepa2_tpu.ops.flash_attention_dn import flash_attention_bhdn


def _qkv(B=2, N=128, H=2, D=32, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.randn(B, N, H, D), jnp.float32) for _ in range(3)
    )


def _collect_eqns(obj, out):
    if hasattr(obj, "eqns"):  # Jaxpr
        for eqn in obj.eqns:
            out.append(eqn)
            for v in eqn.params.values():
                _collect_eqns(v, out)
    elif hasattr(obj, "jaxpr"):  # ClosedJaxpr
        _collect_eqns(obj.jaxpr, out)
    elif isinstance(obj, (list, tuple)):
        for x in obj:
            _collect_eqns(x, out)


def _count_pallas(jaxpr):
    eqns = []
    _collect_eqns(jaxpr.jaxpr, eqns)
    return sum(1 for e in eqns if e.primitive.name == "pallas_call")


@pytest.fixture
def saveable_flag():
    """Restore the module knob after tests that flip it."""
    old = fa.SAVEABLE_RESIDUALS
    yield
    fa.SAVEABLE_RESIDUALS = old


def test_attach_grad_parity_bhnd(saveable_flag):
    """Split-structure grads == fused-custom-vjp grads (BHND family)."""
    q, k, v = _qkv()

    def loss(q, k, v):
        out = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    fa.SAVEABLE_RESIDUALS = False
    ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    fa.SAVEABLE_RESIDUALS = True
    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-6, rtol=1e-6)


def test_attach_grad_parity_dn(saveable_flag):
    """Split-structure grads == fused-custom-vjp grads (DN family)."""
    rng = np.random.RandomState(1)
    B, H, D, N = 2, 2, 32, 128
    q, k, v = (jnp.asarray(rng.randn(B, H, D, N), jnp.float32)
               for _ in range(3))

    def loss(q, k, v):
        out = flash_attention_bhdn(q, k, v, block_q=64, block_k=64,
                                   interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    fa.SAVEABLE_RESIDUALS = False
    ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    fa.SAVEABLE_RESIDUALS = True
    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-6, rtol=1e-6)


def _grad_kernel_count(policy, q, k, v):
    def f(q, k, v):
        out = flash_attention(q, k, v, block_q=64, block_k=64,
                              interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    if policy == "none":
        g = jax.grad(f, argnums=(0, 1, 2))
    else:
        ck = jax.checkpoint(f, policy=resolve_remat_policy(policy))
        g = jax.grad(ck, argnums=(0, 1, 2))
    return _count_pallas(jax.make_jaxpr(g)(q, k, v))


def test_policy_skips_fwd_recompute():
    """save_attn keeps the fwd kernel out of the bwd recompute jaxpr:
    kernel count == the un-rematted grad; full remat pays one extra."""
    assert fa.SAVEABLE_RESIDUALS, "default must be the saveable structure"
    q, k, v = _qkv()
    n_noremat = _grad_kernel_count("none", q, k, v)
    n_full = _grad_kernel_count("full", q, k, v)
    n_save = _grad_kernel_count("save_attn", q, k, v)
    n_save_qkv = _grad_kernel_count("save_attn_qkv", q, k, v)
    assert n_full == n_noremat + 1, (n_full, n_noremat)
    assert n_save == n_noremat, (n_save, n_noremat)
    assert n_save_qkv == n_noremat, (n_save_qkv, n_noremat)


def test_policy_remat_grad_parity():
    """Policy remat changes scheduling, not math."""
    q, k, v = _qkv(seed=3)

    def f(q, k, v):
        out = flash_attention(q, k, v, block_q=64, block_k=64,
                              interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    ref = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for policy in ("full", "save_attn", "save_attn_qkv", "save_attn_qkv_h"):
        ck = jax.checkpoint(f, policy=resolve_remat_policy(policy))
        got = jax.grad(ck, argnums=(0, 1, 2))(q, k, v)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-6, rtol=1e-6, err_msg=policy)


def test_resolve_remat_policy_names():
    assert resolve_remat_policy(None) is None
    assert resolve_remat_policy("full") is None
    assert callable(resolve_remat_policy("save_attn"))
    assert callable(resolve_remat_policy("save_attn_qkv"))
    assert callable(resolve_remat_policy("save_attn_qkv_h"))
    with pytest.raises(ValueError):
        resolve_remat_policy("bogus")


def _count_dots(jaxpr):
    eqns = []
    _collect_eqns(jaxpr.jaxpr, eqns)
    return sum(1 for e in eqns if e.primitive.name == "dot_general")


def test_policy_h_skips_fc1_recompute():
    """'save_attn_qkv_h' keeps the fc1 pre-activation ('mlp_h' tag inside
    models.modules.Mlp), so the remat bwd of an MLP needs NO recompute
    GEMMs: grad-of-checkpoint dot count == the un-rematted grad's, while
    'save_attn_qkv' (which saves nothing of the MLP) pays fc1 again."""
    from vjepa2_tpu.models.modules import Mlp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    mlp = Mlp(hidden_dim=64)
    params = mlp.init(jax.random.PRNGKey(0), x)

    def dots(policy):
        # Checkpoint the MLP apply alone (loss outside) to mirror
        # production block-level remat, where the block output is a
        # boundary value and is never recomputed.
        apply = mlp.apply
        if policy != "none":
            apply = jax.checkpoint(apply, policy=resolve_remat_policy(policy))

        def loss(p, x):
            return (apply(p, x) ** 2).sum()

        g = jax.grad(loss, argnums=(0, 1))
        return _count_dots(jax.make_jaxpr(g)(params, x))

    n_noremat = dots("none")
    n_qkv = dots("save_attn_qkv")
    n_h = dots("save_attn_qkv_h")
    assert n_h == n_noremat, (n_h, n_noremat)
    assert n_qkv > n_h, (n_qkv, n_h)


def test_policy_h_grad_parity_mlp():
    """'save_attn_qkv_h' changes scheduling, not math, through Mlp AND
    SwiGLUFFN (both carry 'mlp_h' tags)."""
    from vjepa2_tpu.models.modules import Mlp, SwiGLUFFN

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    for mod in (Mlp(hidden_dim=64), SwiGLUFFN(hidden_dim=64)):
        params = mod.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return (mod.apply(p, x) ** 2).sum()

        ref = jax.grad(loss, argnums=(0, 1))(params, x)
        ck = jax.checkpoint(loss, policy=resolve_remat_policy("save_attn_qkv_h"))
        got = jax.grad(ck, argnums=(0, 1))(params, x)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-6, rtol=1e-6)


def test_model_level_policy_wiring():
    """vit_tiny + remat_policy compiles and matches full-remat numerics on
    the CPU fallback path (no kernels — the policy simply saves nothing)."""
    from vjepa2_tpu.models.vision_transformer import vit_tiny

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 4, 32, 32, 3), jnp.float32)
    outs = {}
    for policy in (None, "save_attn"):
        enc = vit_tiny(img_size=(32, 32), num_frames=4, tubelet_size=2,
                       use_rope=True, use_activation_checkpointing=True,
                       remat_policy=policy)
        params = enc.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return (enc.apply(p, x).astype(jnp.float32) ** 2).mean()

        outs[policy] = jax.grad(loss)(params)
    a = jax.tree.leaves(outs[None])
    b = jax.tree.leaves(outs["save_attn"])
    for x1, x2 in zip(a, b):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=1e-6, rtol=1e-6)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
