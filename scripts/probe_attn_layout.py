"""Layout-friction experiment: does computing q/k/v directly in BHND (and
consuming the attention output in BHND) remove the ~0.3 ms/layer relayout
copies the device trace shows around the flash custom-call?

A: current model pattern — one qkv dense -> [B,N,3,H,D] -> unbind ->
   flash (BNHD wrapper transposes to BHND and back) -> out dense.
B: same params, different contraction order — per-slice einsum
   'bnc,chd->bhnd' feeding flash_attention_bhnd directly, out-projection
   einsum 'bhnd,hdc->bnc'.

Both stacks: 4 layers, ViT-L shape (B8 N2048 H16 D64), fwd + grad.
Run: timeout 1700 python -u scripts/probe_attn_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


from vjepa2_tpu.ops.flash_attention import flash_attention, flash_attention_bhnd

B, N, H, D = 8, 2048, 16, 64
C = H * D
L = 4
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, N, C), jnp.bfloat16)
Wqkv = [jnp.asarray(rs.randn(C, 3 * C) * 0.02, jnp.bfloat16) for _ in range(L)]
Wout = [jnp.asarray(rs.randn(C, C) * 0.02, jnp.bfloat16) for _ in range(L)]


def stack_a(x, Wqkv, Wout):
    for wq, wo in zip(Wqkv, Wout):
        qkv = (x @ wq).reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = flash_attention(q, k, v)  # BNHD wrapper: transposes inside
        x = x + o.reshape(B, N, C) @ wo
    return x.astype(jnp.float32).mean()


def stack_b(x, Wqkv, Wout):
    for wq, wo in zip(Wqkv, Wout):
        w = wq.reshape(C, 3, H, D)
        q = jnp.einsum("bnc,chd->bhnd", x, w[:, 0])
        k = jnp.einsum("bnc,chd->bhnd", x, w[:, 1])
        v = jnp.einsum("bnc,chd->bhnd", x, w[:, 2])
        o = flash_attention_bhnd(q, k, v)  # already BHND
        x = x + jnp.einsum("bhnd,hdc->bnc", o, wo.reshape(H, D, C))
    return x.astype(jnp.float32).mean()


def timed(name, fn, n=10, chains=2):
    f = jax.jit(fn)
    g = jax.jit(jax.grad(lambda x, a, b: fn(x, a, b)))
    out = f(x, Wqkv, Wout); float(out)
    best = []
    for _ in range(chains):
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            o = f(x + o.astype(jnp.bfloat16), Wqkv, Wout)
        float(o)
        best.append((time.perf_counter() - t0) / n * 1e3)
    log(f"{name} fwd: {min(best):.2f} ms")
    gout = g(x, Wqkv, Wout); float(gout.astype(jnp.float32).mean())
    best = []
    for _ in range(chains):
        t0 = time.perf_counter()
        acc = gout
        for _ in range(n):
            acc = g(x + acc.astype(jnp.bfloat16) * 1e-30, Wqkv, Wout)
        float(acc.astype(jnp.float32).mean())
        best.append((time.perf_counter() - t0) / n * 1e3)
    log(f"{name} grad: {min(best):.2f} ms")


# numerical agreement first
va = jax.jit(stack_a)(x, Wqkv, Wout)
vb = jax.jit(stack_b)(x, Wqkv, Wout)
log(f"outputs: A={float(va):.6f} B={float(vb):.6f}")

timed("A (qkv dense + transposes)", stack_a)
timed("B (einsum BHND direct)", stack_b)
log("DONE")
