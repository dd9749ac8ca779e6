"""Transformer building blocks (flax.linen), TPU-first.

Functional re-design of reference `src/models/utils/modules.py`:

* channels-last everywhere; attention runs in BNHD layout on the MXU via a
  single fused SDPA (`vjepa2_tpu.ops.attention.sdpa`).
* RoPE takes explicit per-token position ids so masked (sparse) token sets
  work — see `vjepa2_tpu.ops.rope`.
* The AC (action-conditioned) attention treats conditioning tokens uniformly
  by giving them factorized position ids (t, 0, 0): rotating by angle zero is
  the identity, which reproduces the reference's "temporal-RoPE only for
  action tokens" (`modules.py:190-195`) without per-token Python loops.
* Block-causal masking is generated from frame ids on the fly
  (frame_q >= frame_kv), equivalent to reference
  `build_action_block_causal_attention_mask` (`modules.py:12-23`).
* Init parity: trunc-normal(0.02) kernels, zero biases, and the reference's
  per-layer residual-branch rescale 1/sqrt(2*layer_id) folded into the
  initializers of ``attn.proj`` and ``mlp.fc2`` (`modules.py` users call
  ``_rescale_blocks``; note the reference rescales SwiGLU's *fc2* — the value
  branch — not the output fc3; we replicate that quirk).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vjepa2_tpu.ops.attention import sdpa
from vjepa2_tpu.ops.rope import (
    apply_rope_cache,
    build_rope_cache,
    rope_3d_dims,
    rope_angles,
    rotate_pairs,
    separate_positions,
)

Dtype = jnp.dtype


def trunc_normal(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def scaled_trunc_normal(std: float, scale: float):
    """trunc_normal(std) then multiply by ``scale`` (residual rescale at init)."""
    base = trunc_normal(std)

    def init(key, shape, dtype):
        return base(key, shape, dtype) * scale

    return init


# Fuse the pre-attention LayerNorm + qkv projection (+ split-half RoPE) into
# one pallas kernel (`ops/ln_qkv.py`) inside Block when the flash path is
# active. The standalone pallas LayerNorm LOST step time (see LayerNorm
# docstring); moving the whole LN->qkv->rope neighborhood keeps the fusion
# boundary clean. Flip here for step-level A/B (scripts/probe_regress.py).
FUSE_LN_QKV = False

# Sibling flag: fuse the pre-MLP LayerNorm + fc1 projection + exact GELU
# into one pallas kernel (`ops/ln_mlp.py`) inside Block. Same rationale and
# same caution (flag-gated pending the step-level A/B on hardware —
# `scripts/probe_ln_qkv_step.py` sweeps both flags).
FUSE_LN_MLP = False

# Narrow-head (Dh <= ops.flash_attention_dn.DN_MAX_D) attention rides the
# DN layout
# (`ops/flash_attention_dn.py`): qkv projected straight into [B, H, D, N] so
# predictor tensors stop paying the 4x lane-pad HBM tax. Read at trace time
# inside Attention; the knob exists for one-process step-level A/Bs
# (`scripts/probe_dn_step.py`). Default ON: the r4s3 hardware A/B (full
# ViT-L bs8 16f@256 pretrain step, interleaved one-process, 4 rounds,
# min-of-rounds) measured dn 474.3 vs bhnd 539.4 ms/step (-65 ms, -12%),
# after the on-hardware DN kernel tests passed at the real predictor shape
# (lane blocks x128 or array-equal — the policy interpret mode never
# enforces). The r4s4 follow-up A/B extended the route to encoder widths
# (DN_MAX_D 48 -> 64 in ops/flash_attention_dn.py): dn64 406.9 vs dn
# 465.9 ms/step, another -59 ms.
NARROW_DN = True

def set_ln_fusions(csv: str) -> None:
    """Set both LN-prologue fusion flags from a comma list ('qkv,mlp', 'qkv',
    'mlp', or '' for neither). The one parser for every CLI that exposes the
    A/B (bench.py --fuse-ln, scripts/trace_step.py --fuse-ln)."""
    global FUSE_LN_QKV, FUSE_LN_MLP
    sel = {s.strip() for s in csv.split(",") if s.strip()}
    unknown = sel - {"qkv", "mlp"}
    if unknown:
        raise ValueError(f"unknown LN fusion(s) {sorted(unknown)}: "
                         "expected a comma list drawn from 'qkv','mlp'")
    FUSE_LN_QKV = "qkv" in sel
    FUSE_LN_MLP = "mlp" in sel


def resolve_remat_policy(name):
    """Map a config-level remat policy name to a `jax.checkpoint` policy.

    - None / 'full': plain full remat (recompute everything; the r1-r4
      behavior).
    - 'save_attn': save the flash kernels' (out, lse) pairs
      (`checkpoint_name` tags inside `ops/flash_attention*.py`) — the bwd
      recompute skips the attention fwd kernel entirely, which dominates
      the block at long-clip shapes (N=8192: attention is ~32 of 56
      FLOP-units vs qkv 6 / proj 2 / mlp 16). Costs one extra
      [B, N, C]-sized bf16 + [B, H, N] fp32 save per layer.
    - 'save_attn_qkv': additionally saves the q/k/v projections
      ('flash_qkv' tags) so the attention branch recomputes nothing.
    - 'save_attn_qkv_h': additionally saves the MLP fc1 pre-activation
      ('mlp_h' tags, width mlp_ratio*C) so the only GEMMs left in the bwd
      recompute are the attention out-projection — at the price of the
      widest per-layer save. The saves materialize only in differentiated
      blocks (JEPA target encoders are stop-grad), so the HBM cost is set
      by the ctx/predictor lengths, not the full clip.
    """
    if name in (None, "full"):
        return None
    cp = jax.checkpoint_policies
    if name == "save_attn":
        return cp.save_only_these_names("flash_out", "flash_lse")
    if name == "save_attn_qkv":
        return cp.save_only_these_names("flash_out", "flash_lse", "flash_qkv")
    if name == "save_attn_qkv_h":
        return cp.save_only_these_names(
            "flash_out", "flash_lse", "flash_qkv", "mlp_h")
    raise ValueError(
        f"unknown remat_policy {name!r}: expected one of "
        "None/'full', 'save_attn', 'save_attn_qkv', 'save_attn_qkv_h'")


# Diagnostic knob (scripts/probe_step_buckets.py, scripts/probe_ln_encode.py):
# False runs LayerNorm in the compute dtype to measure what the fp32
# upcast+reduce costs at step level. Production keeps True — the reference's
# autocast leaves LN in fp32.
LN_UPCAST = True
# With LN_UPCAST False: True computes ONLY the mean/var reductions in fp32
# and normalizes in the compute dtype (bf16 loads/stores, fp32 accumulation —
# the numerics middle ground VERDICT r4 weak-#3 asks to measure).
LN_MIXED_STATS = False


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 regardless of compute dtype (eps 1e-6).

    Params are declared directly ("scale"/"bias" under this module's own
    scope) so callers can fetch them with ``return_params=True`` and fuse
    the LN into a neighboring kernel (`ops/ln_qkv.py` — the pre-attention
    LN + qkv projection prologue). The standalone compute path stays on the
    XLA formula deliberately: a fused pallas LayerNorm (`ops/layernorm.py`)
    is ~2x faster in isolation but made the full pretrain step ~6% SLOWER
    (537 -> 569 ms) — the opaque custom call breaks the elementwise fusions
    XLA builds around its own LN reduce."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        if return_params:
            return scale, bias
        if not LN_UPCAST and LN_MIXED_STATS:
            # stats reductions in fp32, normalize/affine in compute dtype
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                - jnp.square(mean), 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon)
            y = (x - mean.astype(self.dtype)) * inv.astype(self.dtype)
            return y * scale.astype(self.dtype) + bias.astype(self.dtype)
        ln_dtype = jnp.float32 if LN_UPCAST else self.dtype
        xf = x.astype(ln_dtype)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        # fast-variance formulation, matching flax nn.LayerNorm defaults
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean),
            0.0,
        )
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(ln_dtype) + bias.astype(ln_dtype)
        return y.astype(self.dtype)


class _DenseParams(nn.Module):
    """Declares an nn.Dense-compatible param pair (kernel [in, out] + bias)
    without applying it — same tree as the Dense it stands in for, so a
    checkpoint written by either path loads in the other. Used by the fused
    LN+fc1 prologue (`ops/ln_mlp.py`), mirroring `_QKVProjBHND`."""

    features: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", trunc_normal(self.init_std),
                            (in_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    out_init_scale: float = 1.0

    @nn.compact
    def __call__(self, x, ln=None):
        out_dim = self.out_dim or x.shape[-1]
        if ln is not None:
            # fused LN+fc1+GELU prologue (`ops/ln_mlp.py`): x is the
            # PRE-LayerNorm residual stream; the LN intermediate and the
            # pre-GELU activation never exist in HBM. Only reachable from
            # Block's FUSE_LN_MLP gate.
            from vjepa2_tpu.ops import ln_mlp as lnm

            kernel, bias = _DenseParams(
                features=self.hidden_dim, init_std=self.init_std, name="fc1",
            )(x.shape[-1])
            x = lnm.ln_mlp(x, ln[0], ln[1], kernel.astype(self.dtype),
                           bias.astype(jnp.float32))
        else:
            x = nn.Dense(
                self.hidden_dim,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal(self.init_std),
                bias_init=nn.initializers.zeros,
                name="fc1",
            )(x)
            # Saveable residual for the 'save_attn_qkv_h' remat policy: the
            # fc1 pre-activation is the one mlp tensor the bwd pass cannot do
            # without (gelu' and fc2's input both derive from it), so keeping
            # it drops the fc1 GEMM — the largest non-attention recompute —
            # from the remat bwd. Transparent (a `name` primitive) otherwise.
            x = checkpoint_name(x, "mlp_h")
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            out_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=scaled_trunc_normal(self.init_std, self.out_init_scale),
            bias_init=nn.initializers.zeros,
            name="fc2",
        )(x)
        return x


class SwiGLUFFN(nn.Module):
    """SwiGLU FFN with the reference's 2/3-width + align-8 rounding."""

    hidden_dim: int
    out_dim: Optional[int] = None
    wide_silu: bool = True
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    out_init_scale: float = 1.0  # applied to fc2 (value branch) as in reference

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        hidden = self.hidden_dim
        if self.wide_silu:
            hidden = int(2 * hidden / 3)
            hidden = (hidden + 7) // 8 * 8
        dense = lambda d, name, init: nn.Dense(
            d,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=init,
            bias_init=nn.initializers.zeros,
            name=name,
        )
        x1 = dense(hidden, "fc1", trunc_normal(self.init_std))(x)
        x2 = dense(hidden, "fc2", scaled_trunc_normal(self.init_std, self.out_init_scale))(x)
        # Same 'mlp_h' saveable residuals as Mlp.fc1: silu' needs x1, the
        # product needs both — saving the pair drops both input GEMMs from
        # the remat bwd under 'save_attn_qkv_h'.
        x1 = checkpoint_name(x1, "mlp_h")
        x2 = checkpoint_name(x2, "mlp_h")
        h = nn.silu(x1) * x2
        return dense(out_dim, "fc3", trunc_normal(self.init_std))(h)


def _qkv(x, dim, num_heads, qkv_bias, dtype, init_std, name="qkv"):
    B, N, _ = x.shape
    qkv = nn.Dense(
        dim * 3,
        use_bias=qkv_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=trunc_normal(init_std),
        bias_init=nn.initializers.zeros,
        name=name,
    )(x)
    qkv = qkv.reshape(B, N, 3, num_heads, dim // num_heads)
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # each [B, N, H, Dh]


class _QKVProjBHND(nn.Module):
    """The qkv projection contracted straight into [B, H, N, Dh] operands.

    Same parameter tree as the fused ``nn.Dense(3*dim)`` it replaces
    (kernel [C, 3*dim], bias [3*dim] under this module's name) — only the
    contraction order differs: three 'bnc,chd->bhnd' einsums produce the
    layout the flash custom-call requires, so XLA's layout assignment can
    put the transposition inside the dots instead of emitting per-layer
    relayout copies (~0.3 ms each, device trace r3).

    Fused-prologue path: when ``ln=(scale, bias)`` is passed, ``x`` is the
    PRE-LayerNorm residual stream and the whole LN -> qkv projection
    (-> split-half RoPE with ``rope_expanded`` tables) runs as ONE pallas
    kernel (`ops/ln_qkv.py`) — the LN intermediate never exists in HBM.
    ``head_perm`` (the split-half rope layout permutation) is folded into
    the q/k weight COLUMNS via a 0/1 permutation-matrix matmul: exact (one
    nonzero per column), and its transpose is another matmul, so dW stays
    scatter-free (a static gather on w cost +26 ms/step through dW — r3
    bisect, `scripts/probe_regress.py`)."""

    dim: int
    num_heads: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x, ln=None, rope_expanded=None, head_perm=None,
                 dn: bool = False):
        C = x.shape[-1]
        H = self.num_heads
        Dh = self.dim // H
        kernel = self.param("kernel", trunc_normal(self.init_std),
                            (C, 3 * self.dim), jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (3 * self.dim,),
                              jnp.float32)
        if dn:
            # Narrow-head DN layout (`ops/flash_attention_dn.py`): contract
            # straight into [B, H, D, N] so the (D=32, N) minor dims tile
            # EXACTLY — the BHND layout pads D to 128 lanes (4x HBM for the
            # predictor). The split-half rope permutation folds into the
            # q/k weight COLUMNS via a 0/1 permutation-matrix matmul (exact;
            # its transpose is another matmul so dW stays scatter-free —
            # same trick as the ln path below).
            assert ln is None, "dn path composes with the plain projection"
            import numpy as np

            w3 = kernel.reshape(C, 3, H, Dh)
            b3 = (bias if self.use_bias
                  else jnp.zeros((3 * self.dim,), jnp.float32)).reshape(3, H, Dh)
            if head_perm is not None:
                P = jnp.asarray(np.eye(Dh, dtype=np.float32)[:, list(head_perm)])
                permute = lambda t: jnp.einsum(
                    "...d,de->...e", t, P, preferred_element_type=jnp.float32)
                w3 = jnp.stack([permute(w3[:, 0]), permute(w3[:, 1]), w3[:, 2]],
                               axis=1)
                b3 = jnp.stack([permute(b3[0]), permute(b3[1]), b3[2]])
            w = w3.astype(self.dtype)
            xd = x.astype(self.dtype)
            q = jnp.einsum("bnc,chd->bhdn", xd, w[:, 0])
            k = jnp.einsum("bnc,chd->bhdn", xd, w[:, 1])
            v = jnp.einsum("bnc,chd->bhdn", xd, w[:, 2])
            if self.use_bias:
                b = b3.astype(self.dtype)[:, None, :, :, None]  # [3,1,H,Dh,1]
                q, k, v = q + b[0], k + b[1], v + b[2]
            return q, k, v  # each [B, H, Dh, N]; q/k pre-permuted
        if ln is not None:
            from vjepa2_tpu.ops import ln_qkv as lnq
            import numpy as np

            w3 = kernel.reshape(C, 3, H, Dh)
            b3 = (bias if self.use_bias
                  else jnp.zeros((3 * self.dim,), jnp.float32)).reshape(3, H, Dh)
            if head_perm is not None and rope_expanded is not None:
                # new[..., d] = old[..., perm[d]]  <=>  old @ eye[:, perm]
                P = jnp.asarray(np.eye(Dh, dtype=np.float32)[:, list(head_perm)])
                permute = lambda t: jnp.einsum(
                    "...d,de->...e", t, P, preferred_element_type=jnp.float32)
                w3 = jnp.stack([permute(w3[:, 0]), permute(w3[:, 1]), w3[:, 2]],
                               axis=1)
                b3 = jnp.stack([permute(b3[0]), permute(b3[1]), b3[2]])
            q, k, v = lnq.ln_qkv(
                x, ln[0], ln[1],
                w3.reshape(C, 3 * self.dim).astype(self.dtype),
                b3.reshape(3 * self.dim).astype(jnp.float32),
                rope=rope_expanded, num_heads=H, head_dim=Dh,
            )
            return q, k, v  # [B, H, N, Dh]; q/k already rotated+permuted
        w = kernel.reshape(C, 3, H, Dh).astype(self.dtype)
        x = x.astype(self.dtype)
        q = jnp.einsum("bnc,chd->bhnd", x, w[:, 0])
        k = jnp.einsum("bnc,chd->bhnd", x, w[:, 1])
        v = jnp.einsum("bnc,chd->bhnd", x, w[:, 2])
        if self.use_bias:
            b = bias.reshape(3, H, 1, Dh).astype(self.dtype)
            q, k, v = q + b[0], k + b[1], v + b[2]
        return q, k, v  # each [B, H, N, Dh]


class _OutProjBHND(nn.Module):
    """Out-projection consuming [B, H, N, Dh] directly ('bhnd,hdc->bnc').
    Same parameter tree as ``nn.Dense(dim)`` (kernel [dim, dim], rows
    (h-major, d) — exactly the order the BNHD reshape produced)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    proj_init_scale: float = 1.0

    @nn.compact
    def __call__(self, out, dn: bool = False):
        H = self.num_heads
        Dh = self.dim // H
        kernel = self.param(
            "kernel", scaled_trunc_normal(self.init_std, self.proj_init_scale),
            (self.dim, self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        w = kernel.reshape(H, Dh, self.dim).astype(self.dtype)
        if dn:  # [B, H, Dh, N] from the narrow-head DN kernels
            return jnp.einsum("bhdn,hdc->bnc", out.astype(self.dtype), w) \
                + bias.astype(self.dtype)
        return jnp.einsum("bhnd,hdc->bnc", out.astype(self.dtype), w) + bias.astype(self.dtype)


def _rope_rotate_qk(q, k, d_ids, h_ids, w_ids):
    """Rotate q and k [B, N, H, Dh] by factorized (d, h, w) float ids [B, N] or [N]."""
    head_dim = q.shape[-1]
    d_dim, h_dim, w_dim = rope_3d_dims(head_dim)

    def rot(x):
        s = 0
        parts = []
        for ids, dim in ((d_ids, d_dim), (h_ids, h_dim), (w_ids, w_dim)):
            cos, sin = rope_angles(ids, dim)
            cos, sin = cos[..., None, :], sin[..., None, :]
            sub = x[..., s : s + dim]
            parts.append((sub * cos + rotate_pairs(sub) * sin).astype(x.dtype))
            s += dim
        if s < head_dim:
            parts.append(x[..., s:])
        return jnp.concatenate(parts, axis=-1)

    return rot(q), rot(k)


class Attention(nn.Module):
    """Self-attention, optionally with factorized 3D RoPE.

    When ``use_rope`` is True, callers must pass ``pos_ids`` ([B, N] or [N]
    flat token indices) plus the static patch-grid dims ``h_patches`` /
    ``w_patches``. ``grid_size`` (if set) rescales spatial ids by
    grid_size / {H', W'} as the AC predictor does.

    ``cp_attend``: optional context-parallel attention callable
    (``ops.ring_attention.seq_sharded_attention``) — when set, q/k are
    RoPE-rotated locally and attention runs token-sharded over the mesh
    'model' axis (takes precedence over ``use_flash``).
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    use_rope: bool = False
    is_causal: bool = False
    grid_size: Optional[int] = None
    use_flash: bool = False
    cp_attend: Optional[object] = None
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    proj_init_scale: float = 1.0
    # static split-half head permutation matching the model-level
    # pre-expanded rope tables; applied to q/k ACTIVATIONS per call (a fused
    # elementwise gather — folding it into the qkv weights instead scattered
    # through dW every step and cost +26 ms at ViT-L, r3 bisect)
    head_perm: Optional[tuple] = None
    # static count of REAL tokens when the model stack-padded the sequence
    # (pad keys masked in-kernel; pad query rows sliced off by the model)
    kv_valid: Optional[int] = None

    @nn.compact
    def __call__(self, x, pos_ids=None, attn_mask=None, h_patches=None, w_patches=None,
                 rope_cache=None, rope_expanded=None, ln_params=None):
        from vjepa2_tpu.ops.attention import attend_bhnd

        B, N, C = x.shape
        if ln_params is not None:
            # fused LN+qkv(+RoPE) prologue (`ops/ln_qkv.py`): x is the
            # PRE-LayerNorm residual stream; q/k come back rotated, so the
            # attention call below runs rope-free. Only reachable from
            # Block's fusion gate (flash on, no mask/causal/CP).
            q, k, v = _QKVProjBHND(
                dim=self.dim, num_heads=self.num_heads, use_bias=self.qkv_bias,
                dtype=self.dtype, init_std=self.init_std, name="qkv",
            )(x, ln=ln_params,
              rope_expanded=rope_expanded if self.use_rope else None,
              head_perm=self.head_perm if self.use_rope else None)
            out = attend_bhnd(q, k, v, use_flash=self.use_flash,
                              kv_valid=self.kv_valid)
            return _OutProjBHND(
                dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                init_std=self.init_std, proj_init_scale=self.proj_init_scale,
                name="proj",
            )(out)
        # Narrow-head DN route (`ops/flash_attention_dn.py`): at Dh below
        # the 128-lane tile the BHND tensors pad the head dim (4x HBM for
        # the predictor's Dh=32, 2x for the encoders' Dh=64); projecting
        # straight into [B, H, D, N] tiles exactly. Gated to shapes the DN
        # family supports: flash on, no mask/causal/CP, rope pre-expanded
        # (or off), `dn_head_eligible` width (<= fdn.DN_MAX_D), lane-
        # tileable N. NARROW_DN is the step-level A/B knob (trace time).
        Dh = self.dim // self.num_heads
        use_dn = (
            NARROW_DN and self.use_flash
            and attn_mask is None and not self.is_causal
            and self.cp_attend is None
            and (not self.use_rope or rope_expanded is not None)
        )
        if use_dn:
            from vjepa2_tpu.ops.flash_attention_dn import dn_head_eligible

            use_dn = dn_head_eligible(Dh)
        if use_dn:
            # the full eligibility check (Mosaic available + a lane-legal
            # block plan for this N — N in DN layout is the LANE dim, so
            # blocks must be x128 or array-equal); ineligible shapes take
            # the BHND *flash* branch below, never attend_bhdn's XLA
            # fallback
            from vjepa2_tpu.ops.flash_attention_dn import supports_dn

            use_dn = supports_dn(N, Dh)
        if use_dn:
            from vjepa2_tpu.ops.attention import attend_bhdn

            q, k, v = _QKVProjBHND(
                dim=self.dim, num_heads=self.num_heads, use_bias=self.qkv_bias,
                dtype=self.dtype, init_std=self.init_std, name="qkv",
            )(x, dn=True,
              rope_expanded=rope_expanded if self.use_rope else None,
              head_perm=self.head_perm if self.use_rope else None)
            out = attend_bhdn(
                q, k, v,
                rope_expanded=rope_expanded if self.use_rope else None,
                use_flash=self.use_flash, kv_valid=self.kv_valid,
            )
            return _OutProjBHND(
                dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                init_std=self.init_std, proj_init_scale=self.proj_init_scale,
                name="proj",
            )(out, dn=True)
        # qkv contracted straight into BHND (the flash layout) and the
        # output consumed as BHND — no relayout copies at the kernel edge
        q, k, v = _QKVProjBHND(
            dim=self.dim, num_heads=self.num_heads, use_bias=self.qkv_bias,
            dtype=self.dtype, init_std=self.init_std, name="qkv",
        )(x)

        if self.use_rope and rope_cache is None and rope_expanded is None:
            assert pos_ids is not None and h_patches is not None and w_patches is not None
            rope_cache = build_rope_cache(
                pos_ids, self.dim // self.num_heads, h_patches, w_patches,
                grid_size=self.grid_size,
            )

        use_cp = (
            self.cp_attend is not None
            and attn_mask is None
            and not self.is_causal
            # sequences that don't divide the ring fall through to the local
            # path so flash/RoPE fusion still applies to them
            and N % getattr(self.cp_attend, "axis_size", 1) == 0
        )
        def _rotate_bnhd(t):
            # BNHD rotation for the non-flash branches; honors whichever
            # rope representation this forward carries
            if rope_expanded is not None:
                from vjepa2_tpu.ops import flash_attention as fa

                cos, sin = rope_expanded  # [B|1, N, D] split-half
                if self.head_perm is not None:
                    t = t[..., list(self.head_perm)]
                return fa._rope_rotate(
                    t.astype(jnp.float32), cos[:, :, None], sin[:, :, None]
                ).astype(t.dtype)
            return apply_rope_cache(t, rope_cache)

        if use_cp:
            # ring attention shards the token dim of [B, N, H, D]
            qn, kn, vn = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if self.use_rope:
                qn = _rotate_bnhd(qn)
                kn = _rotate_bnhd(kn)
            out = self.cp_attend(qn, kn, vn).transpose(0, 2, 1, 3)
        elif attn_mask is None and not self.is_causal:
            # RoPE rides into the kernel when the flash path is enabled
            out = attend_bhnd(
                q, k, v,
                rope_cache=rope_cache if self.use_rope else None,
                use_flash=self.use_flash,
                rope_expanded=rope_expanded if self.use_rope else None,
                head_perm=self.head_perm if self.use_rope else None,
                kv_valid=self.kv_valid,
            )
        else:
            qn, kn, vn = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if self.use_rope:
                qn = _rotate_bnhd(qn)
                kn = _rotate_bnhd(kn)
            out = sdpa(qn, kn, vn, attn_mask=attn_mask,
                       is_causal=self.is_causal).transpose(0, 2, 1, 3)
        return _OutProjBHND(
            dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
            init_std=self.init_std, proj_init_scale=self.proj_init_scale,
            name="proj",
        )(out)


def build_ac_rope_cache(head_dim: int, T: int, h_patches: int, w_patches: int,
                        cond_tokens: int, grid_size: int):
    """Fused (cos, sin) for the interleaved AC sequence: conditioning tokens
    get factorized ids (t, 0, 0); frame tokens (t, row*snap, col*snap)."""
    from vjepa2_tpu.ops.rope import rope_angles

    A, HW = cond_tokens, h_patches * w_patches
    N = T * (A + HW)
    grid_flat = jnp.arange(T * HW, dtype=jnp.int32)
    gd, gh, gw = separate_positions(grid_flat, h_patches, w_patches)
    gh = gh.astype(jnp.float32) * (grid_size / h_patches)
    gw = gw.astype(jnp.float32) * (grid_size / w_patches)
    gd = gd.astype(jnp.float32)

    def interleave(frame_vals, cond_vals):
        f = frame_vals.reshape(T, HW)
        c = cond_vals.reshape(T, A)
        return jnp.concatenate([c, f], axis=1).reshape(N)

    cond_t = jnp.repeat(jnp.arange(T, dtype=jnp.float32)[:, None], A, axis=1).reshape(-1)
    d_ids = interleave(gd, cond_t)
    h_ids = interleave(gh, jnp.zeros(T * A, jnp.float32))
    w_ids = interleave(gw, jnp.zeros(T * A, jnp.float32))
    d_dim, h_dim, w_dim = rope_3d_dims(head_dim)
    parts = [rope_angles(ids, dim) for ids, dim in
             ((d_ids, d_dim), (h_ids, h_dim), (w_ids, w_dim))]
    cos = jnp.concatenate([p[0] for p in parts], axis=-1)
    sin = jnp.concatenate([p[1] for p in parts], axis=-1)
    return cos, sin


class ACAttention(nn.Module):
    """Attention over interleaved (conditioning + frame) tokens, frame-causal.

    Input layout: [B, T*(A + HW), C] with A conditioning tokens leading each
    frame group (reference `ac_predictor.py:146-153`). Conditioning tokens get
    position ids (t, 0, 0); frame tokens get factorized grid ids snapped to
    ``grid_size``. Frame-causal masking compares per-token frame ids.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    grid_size: int = 16
    is_frame_causal: bool = True
    use_flash: bool = False
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    proj_init_scale: float = 1.0
    # static split-half head permutation matching model-level pre-expanded
    # rope tables (set together with the `rope_expanded` call arg by
    # `VisionTransformerPredictorAC`'s hoist — same machinery as `Attention`)
    head_perm: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, T: int, h_patches: int, w_patches: int, cond_tokens: int,
                 rope_cache=None, rope_expanded=None):
        from vjepa2_tpu.ops.attention import attend_bhdn, attend_bhnd

        B, N, C = x.shape
        A, HW = cond_tokens, h_patches * w_patches
        assert N == T * (A + HW)

        # frame-causal = per-token frame-id segments (O(N), kernel-friendly)
        segment_ids = None
        if self.is_frame_causal:
            segment_ids = jnp.repeat(jnp.arange(T, dtype=jnp.int32), A + HW)  # [N]

        # Narrow-head DN route (same rationale as `Attention`): the AC
        # predictor's Dh = 1024/16 = 64 pads 2x in BHND; frame-causal rides
        # the DN kernels as segment ids (fp32 row+column side inputs).
        # Requires the model-level rope hoist (rope_expanded + head_perm).
        Dh = self.dim // self.num_heads
        use_dn = NARROW_DN and self.use_flash and rope_expanded is not None
        if use_dn:
            from vjepa2_tpu.ops.flash_attention_dn import (
                dn_head_eligible, supports_dn)

            npad = N + ((-N) % 128)
            use_dn = dn_head_eligible(Dh) and supports_dn(npad, Dh)
        if use_dn:
            q, k, v = _QKVProjBHND(
                dim=self.dim, num_heads=self.num_heads, use_bias=self.qkv_bias,
                dtype=self.dtype, init_std=self.init_std, name="qkv",
            )(x, dn=True, rope_expanded=rope_expanded,
              head_perm=self.head_perm)
            out = attend_bhdn(
                q, k, v, rope_expanded=rope_expanded,
                use_flash=self.use_flash, segment_ids=segment_ids,
            )
            return _OutProjBHND(
                dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                init_std=self.init_std, proj_init_scale=self.proj_init_scale,
                name="proj",
            )(out, dn=True)

        # BHND contraction: same trick as `Attention` — no relayout copies
        # at the flash custom-call boundary
        q, k, v = _QKVProjBHND(
            dim=self.dim, num_heads=self.num_heads, use_bias=self.qkv_bias,
            dtype=self.dtype, init_std=self.init_std, name="qkv",
        )(x)

        if rope_cache is None:
            rope_cache = build_ac_rope_cache(
                self.dim // self.num_heads, T, h_patches, w_patches, A, self.grid_size
            )

        out = attend_bhnd(
            q, k, v, rope_cache=rope_cache, segment_ids=segment_ids,
            use_flash=self.use_flash,
        )
        return _OutProjBHND(
            dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
            init_std=self.init_std, proj_init_scale=self.proj_init_scale,
            name="proj",
        )(out)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth (reference `modules.py:53-64`): drop the residual
    branch per sample with prob ``rate``."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return (x / keep) * mask.astype(x.dtype)


class Block(nn.Module):
    """Pre-norm transformer block (reference `modules.py:500-563`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rope: bool = False
    use_silu: bool = False
    wide_silu: bool = True
    is_causal: bool = False
    grid_size: Optional[int] = None
    use_flash: bool = False
    cp_attend: Optional[object] = None
    drop_path_rate: float = 0.0
    layer_id: int = 0  # 0-based; residual rescale uses 1/sqrt(2*(layer_id+1))
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    head_perm: Optional[tuple] = None
    kv_valid: Optional[int] = None

    @nn.compact
    def __call__(
        self, x, pos_ids=None, attn_mask=None, h_patches=None, w_patches=None, deterministic=True,
        rope_cache=None, rope_expanded=None,
    ):
        rescale = 1.0 / math.sqrt(2.0 * (self.layer_id + 1))

        def maybe_drop(y):
            if self.drop_path_rate > 0.0 and not deterministic:
                return drop_path(
                    y, self.drop_path_rate, deterministic, self.make_rng("drop_path")
                )
            return y

        norm1 = LayerNorm(dtype=self.dtype, name="norm1")
        # fused LN+qkv prologue: only when attention runs the plain flash
        # path (no boolean mask, not causal, no CP ring) and rope — if on —
        # is available as pre-expanded split-half tables
        fuse_ln = (
            FUSE_LN_QKV
            and self.use_flash
            and self.cp_attend is None
            and attn_mask is None
            and not self.is_causal
            and (rope_expanded is not None or not self.use_rope)
        )
        ln_params = norm1(x, return_params=True) if fuse_ln else None
        y = x if fuse_ln else norm1(x)
        y = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rope=self.use_rope,
            is_causal=self.is_causal,
            grid_size=self.grid_size,
            use_flash=self.use_flash,
            cp_attend=self.cp_attend,
            dtype=self.dtype,
            init_std=self.init_std,
            proj_init_scale=rescale,
            head_perm=self.head_perm,
            kv_valid=self.kv_valid,
            name="attn",
        )(y, pos_ids=pos_ids, attn_mask=attn_mask, h_patches=h_patches, w_patches=w_patches,
          rope_cache=rope_cache, rope_expanded=rope_expanded, ln_params=ln_params)
        x = x + maybe_drop(y)
        norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        hidden = int(self.dim * self.mlp_ratio)
        if self.use_silu:
            y = SwiGLUFFN(
                hidden_dim=hidden,
                wide_silu=self.wide_silu,
                dtype=self.dtype,
                init_std=self.init_std,
                out_init_scale=rescale,
                name="mlp",
            )(norm2(x))
        elif FUSE_LN_MLP:
            # fused LN+fc1+GELU prologue (`ops/ln_mlp.py`); pallas only
            # where `ln_mlp.supports` holds, XLA-equivalent math otherwise
            y = Mlp(
                hidden_dim=hidden,
                dtype=self.dtype,
                init_std=self.init_std,
                out_init_scale=rescale,
                name="mlp",
            )(x, ln=norm2(x, return_params=True))
        else:
            y = Mlp(
                hidden_dim=hidden,
                dtype=self.dtype,
                init_std=self.init_std,
                out_init_scale=rescale,
                name="mlp",
            )(norm2(x))
        return x + maybe_drop(y)


class ACBlock(nn.Module):
    """Pre-norm block with AC attention (reference `modules.py:432-497`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_silu: bool = False
    wide_silu: bool = True
    grid_size: int = 16
    is_frame_causal: bool = True
    use_flash: bool = False
    layer_id: int = 0
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    head_perm: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, T: int, h_patches: int, w_patches: int, cond_tokens: int,
                 rope_cache=None, rope_expanded=None):
        rescale = 1.0 / math.sqrt(2.0 * (self.layer_id + 1))
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = ACAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            grid_size=self.grid_size,
            is_frame_causal=self.is_frame_causal,
            use_flash=self.use_flash,
            dtype=self.dtype,
            init_std=self.init_std,
            proj_init_scale=rescale,
            head_perm=self.head_perm,
            name="attn",
        )(y, T=T, h_patches=h_patches, w_patches=w_patches, cond_tokens=cond_tokens,
          rope_cache=rope_cache, rope_expanded=rope_expanded)
        x = x + y
        norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        hidden = int(self.dim * self.mlp_ratio)
        if self.use_silu:
            y = SwiGLUFFN(
                hidden_dim=hidden,
                wide_silu=self.wide_silu,
                dtype=self.dtype,
                init_std=self.init_std,
                out_init_scale=rescale,
                name="mlp",
            )(norm2(x))
        elif FUSE_LN_MLP:
            # same fused LN+fc1+GELU prologue as Block (`ops/ln_mlp.py`)
            y = Mlp(
                hidden_dim=hidden,
                dtype=self.dtype,
                init_std=self.init_std,
                out_init_scale=rescale,
                name="mlp",
            )(x, ln=norm2(x, return_params=True))
        else:
            y = Mlp(
                hidden_dim=hidden,
                dtype=self.dtype,
                init_std=self.init_std,
                out_init_scale=rescale,
                name="mlp",
            )(norm2(x))
        return x + y


class CrossAttention(nn.Module):
    """Query tokens cross-attend into a sequence (reference `modules.py:566-594`)."""

    dim: int
    num_heads: int = 12
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    init_std: float = 0.02

    @nn.compact
    def __call__(self, q, x):
        B, n, C = q.shape
        N = x.shape[1]
        Dh = self.dim // self.num_heads
        dense = lambda d, name: nn.Dense(
            d,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal(self.init_std),
            bias_init=nn.initializers.zeros,
            name=name,
        )
        qh = dense(self.dim, "q")(q).reshape(B, n, self.num_heads, Dh)
        kv = dense(self.dim * 2, "kv")(x).reshape(B, N, 2, self.num_heads, Dh)
        out = sdpa(qh, kv[:, :, 0], kv[:, :, 1])
        return out.reshape(B, n, C)


class CrossAttentionBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    init_std: float = 0.02
    mlp_init_scale: float = 1.0

    @nn.compact
    def __call__(self, q, x):
        y = CrossAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            init_std=self.init_std,
            name="xattn",
        )(q, LayerNorm(dtype=self.dtype, name="norm1")(x))
        q = q + y
        y = LayerNorm(dtype=self.dtype, name="norm2")(q)
        q = q + Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio),
            dtype=self.dtype,
            init_std=self.init_std,
            out_init_scale=self.mlp_init_scale,
            name="mlp",
        )(y)
        return q


def build_action_block_causal_attention_mask(T: int, H: int, W: int, add_tokens: int = 1):
    """Boolean [N, N] frame-block-causal mask (reference `modules.py:12-23`).

    Provided for API parity; internally `ACAttention` generates the
    equivalent mask from frame-id comparison without materializing it
    at max_num_frames."""
    n_per_frame = add_tokens + H * W
    frame_of = jnp.repeat(jnp.arange(T), n_per_frame)
    return frame_of[:, None] >= frame_of[None, :]
