"""Probe: does Mosaic (Pallas) execute on the attached TPU at all?

Round-2 finding: Pallas kernels hang through the axon dev tunnel (remote
Mosaic compile never returns). This probe re-checks with escalating stakes,
each stage printing BEFORE it runs so a hang is attributable:

  1. trivial elementwise add kernel (the smallest possible Mosaic program)
  2. flash-attention fwd, tiny shape (512 tokens), correctness vs XLA sdpa
  3. flash-attention fwd, ViT-g encode shape timing vs the XLA path

Run under `timeout 420 python scripts/probe_mosaic_hw.py`; stages flush
stdout so partial output shows how far it got.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


log(f"devices: {jax.devices()}")

# ---- stage 1: trivial kernel ----
log("stage1: compiling trivial add kernel ...")


def add_kernel(x_ref, y_ref, o_ref):
    o_ref[...] = x_ref[...] + y_ref[...]


x = jnp.ones((256, 256), jnp.float32)
y = jnp.full((256, 256), 2.0, jnp.float32)
out = pl.pallas_call(
    add_kernel,
    out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
)(x, y)
val = float(out[0, 0])
log(f"stage1 OK: {val} (expect 3.0)")
if abs(val - 3.0) > 1e-6:
    sys.exit("stage1 WRONG VALUE")

# ---- stage 2: flash fwd tiny, correctness ----
log("stage2: flash attention fwd 512 tokens ...")
from vjepa2_tpu.ops.attention import _manual_sdpa
from vjepa2_tpu.ops.flash_attention import flash_attention

rs = np.random.RandomState(0)
B, N, H, D = 2, 512, 4, 64
q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
ref = _manual_sdpa(q, k, v, None, False, None)
got = flash_attention(q, k, v)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
log(f"stage2 OK: max abs err {err:.4f}")
if err > 0.1:
    sys.exit("stage2 MISMATCH")

# ---- stage 2b: flash fwd with RoPE + segments (the real model config) ----
log("stage2b: flash with rope tables + segment ids ...")
from vjepa2_tpu.ops.rope import build_rope_cache

pos = jnp.arange(N, dtype=jnp.int32)
cache = build_rope_cache(pos, D, 8, 8)
seg = jnp.broadcast_to(jnp.repeat(jnp.arange(4, dtype=jnp.int32), N // 4)[None], (B, N))
got2 = flash_attention(q, k, v, segment_ids=seg, rope_tables=cache)
from vjepa2_tpu.ops.attention import attend

ref2 = attend(q, k, v, rope_cache=cache, segment_ids=seg, use_flash=False)
err2 = float(jnp.max(jnp.abs(got2.astype(jnp.float32) - ref2.astype(jnp.float32))))
log(f"stage2b OK: max abs err {err2:.4f}")

# ---- stage 2c: backward ----
log("stage2c: flash VJP ...")


def loss_flash(q, k, v):
    return flash_attention(q, k, v, rope_tables=cache).astype(jnp.float32).sum()


def loss_ref(q, k, v):
    return attend(q, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32).sum()


gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) for a, b in zip(gf, gr)]
log(f"stage2c OK: grad max errs {errs}")

# ---- stage 3: ViT-g encode shape timing ----
log("stage3: timing at ViT-g encode shape (B8 N2048 H16 D88) ...")
B, N, H, D = 8, 2048, 16, 88
q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
pos = jnp.arange(N, dtype=jnp.int32)
cache_g = build_rope_cache(pos, D, 16, 16)


@jax.jit
def run_flash(q, k, v, c):
    return flash_attention(q + c, k, v, rope_tables=cache_g).astype(jnp.float32).mean()


@jax.jit
def run_xla(q, k, v, c):
    return attend(q + c, k, v, rope_cache=cache_g, use_flash=False).astype(jnp.float32).mean()


for name, fn in (("flash", run_flash), ("xla", run_xla)):
    carry = jnp.bfloat16(0.0)
    float(fn(q, k, v, carry))  # compile
    t0 = time.perf_counter()
    for _ in range(20):
        carry = fn(q, k, v, carry).astype(jnp.bfloat16) * 1e-30
    float(carry)
    dt = (time.perf_counter() - t0) / 20
    log(f"stage3 {name}: {dt*1e3:.2f} ms per 40-layer-equiv single attention call x1")

log("ALL STAGES PASSED")
