"""VPU-bound flash fwd: test per-element-cost reductions on hardware.

Variants (monkeypatching fa._fwd_kernel, jax.clear_caches() between):
  base      — current kernel (exp2, folded scale)
  mxu-sum   — l row-sum via ones-matmul on the MXU instead of VPU reduce
  bf16-exp  — exp2 computed on bf16 (p is rounded to bf16 for the AV matmul
              anyway); l summed from bf16 p via MXU ones-matmul
Run: timeout 1700 python -u scripts/probe_flash_vpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


from vjepa2_tpu.ops import flash_attention as fa
from vjepa2_tpu.ops.attention import attend
from vjepa2_tpu.ops.rope import build_rope_cache

NEG_INF = fa.NEG_INF
LOG2E = fa.LOG2E
_seg_mask = fa._seg_mask
_rope_rotate = fa._rope_rotate


def make_kernel(mxu_sum=False, bf16_exp=False):
    def kern(segq_ref, segk_ref, q_ref, k_ref, v_ref,
             qcos_ref, qsin_ref, kcos_ref, ksin_ref,
             o_ref, lse_ref, m_scr, l_scr, acc_scr,
             *, scale, block_q, block_k, causal, use_rope, use_segments):
        kv_i = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(kv_i == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0]
        k = k_ref[0]
        if use_rope:
            q = _rope_rotate(q.astype(jnp.float32), qcos_ref[0], qsin_ref[0])
            k = _rope_rotate(
                k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
            ).astype(k_ref.dtype)
        else:
            q = q.astype(jnp.float32)
        q = (q * (scale * LOG2E)).astype(q_ref.dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if causal or use_segments:
            q_i = pl.program_id(1)
            if use_segments:
                mask = _seg_mask(segq_ref, segk_ref, block_q, block_k)
            else:
                rows = q_i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                cols = kv_i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                mask = rows >= cols
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        if bf16_exp:
            p_bf = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            ones = jnp.ones((block_k, 1), jnp.bfloat16)
            row = jax.lax.dot_general(
                p_bf, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            corr = jnp.exp2(m_prev - m_new)
            l_scr[...] = l_scr[...] * corr + row
            acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
                p_bf.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            if mxu_sum:
                pb = p.astype(v_ref.dtype)
                ones = jnp.ones((block_k, 1), v_ref.dtype)
                row = jax.lax.dot_general(
                    pb, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                l_scr[...] = l_scr[...] * corr + row
                acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
                    pb, v_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
                acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        m_scr[...] = m_new

        @pl.when(kv_i == nk - 1)
        def _finish():
            denom = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
            o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)
            lse_ref[0] = m_scr[...] * (1.0 / LOG2E) + jnp.log(denom)

    return kern


def time_fn(fn, q, k, v, steps=16, chains=2):
    carry = jnp.bfloat16(0.0)
    float(fn(q, k, v, carry))
    best = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = fn(q, k, v, carry).astype(jnp.bfloat16) * 1e-30
        float(carry)
        best.append((time.perf_counter() - t0) / steps * 1e3)
    return min(best)


for shape_name, (B, N, H, D, grid) in {
    "vitg": (8, 2048, 16, 88, (16, 16)),
    "vitl": (8, 2048, 16, 64, (16, 16)),
}.items():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, *grid)
    ref = attend(q, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32)

    for vname, kw in [("base", {}),
                      ("mxu-sum", {"mxu_sum": True}),
                      ("bf16-exp", {"bf16_exp": True})]:
        fa._fwd_kernel = make_kernel(**kw)
        jax.clear_caches()

        @jax.jit
        def fwd(q, k, v, c):
            return fa.flash_attention(q + c, k, v, rope_tables=cache
                                      ).astype(jnp.float32).mean()

        got = fa.flash_attention(q, k, v, rope_tables=cache).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref)))
        ms = time_fn(fwd, q, k, v)
        log(f"{shape_name} {vname}: {ms:.2f} ms (max err {err:.4f})")

log("DONE")
