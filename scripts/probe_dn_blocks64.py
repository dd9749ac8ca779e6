"""DN-kernel block/pad sweep at the cooldown hot shapes (r5s3).

The save_attn_qkv cooldown trace (5021 ms/step) puts 71% of device time in
the DN flash kernels, and the per-call-site breakdown is:

    predictor fwd  [4,12,32,6528]  13.4 ms x24   964 ms/step
    predictor bwd  [4,12,32,6528]  17.1 ms x24  1232 ms/step
    target fwd     [4,16,64,8192]  12.7 ms x24   915 ms/step
    ctx fwd/bwd    [4,16,64,2304|568]            ~406 ms/step

The shipped `_dn_block_plan` tie-breaks toward a maximal q block, landing
(4096,128) at N=8192 and (2176,128) at N=6528 — a bwd-centric choice made
at 16f predictor lengths (N~1664) and never swept at 64f lengths. N=6528
(= 3*17*128) also has a terrible x128 divisor lattice, so balanced blocks
don't exist at all without padding (6656 = 52*128 and 7168 = 7*1024 do).

This probe measures per-call fwd and full-qkv-grad time across legal
(block_q, block_k) pairs and padded lengths (kv_valid masks the pad keys;
pad q rows are garbage that timing ignores, as in production where they
are sliced off). Methodology: ubench chained fori_loop, interleaved
rounds, min-of-rounds.

Run: timeout 4500 python -u scripts/probe_dn_blocks64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.ubench import bench_table
from vjepa2_tpu.ops.flash_attention_dn import flash_attention_bhdn


def qkv(B, H, D, N, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, H, D, N) * 0.05, jnp.bfloat16)
    return mk(), mk(), mk()


def fwd_case(name, B, H, D, N, bq, bk, kv=None):
    def fn(q, k, v):
        return flash_attention_bhdn(q, k, v, block_q=bq, block_k=bk,
                                    kv_valid_len=kv)
    return (name, fn, qkv(B, H, D, N))


def grad_case(name, B, H, D, N, bq, bk, kv=None):
    def loss(q, k, v):
        out = flash_attention_bhdn(q, k, v, block_q=bq, block_k=bk,
                                   kv_valid_len=kv)
        return (out.astype(jnp.float32) ** 2).sum()

    def fn(q, k, v):
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)[0]
    return (name, fn, qkv(B, H, D, N))


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    cases = []
    # --- target fwd shape [4,16,64,8192] (stop-grad: fwd cost is what
    # the step pays; the same plan also drives ctx bwd at 2304) ---
    for bq, bk in [(4096, 128), (2048, 256), (1024, 512), (512, 1024),
                   (256, 2048), (128, 4096)]:
        cases.append(fwd_case(f"tgt8192 f ({bq},{bk})", 4, 16, 64, 8192,
                              bq, bk))
    # --- predictor shape [4,12,32,6528] fwd + grad; legal blocks at
    # 6528 are only {128,384,2176} ---
    for bq, bk in [(2176, 128), (384, 384), (128, 2176)]:
        cases.append(fwd_case(f"prd6528 f ({bq},{bk})", 4, 12, 32, 6528,
                              bq, bk))
    # padded to 6656 = 52*128 (pad 128 keys, kv_valid masks them)
    for bq, bk in [(1664, 256), (512, 512), (256, 1664)]:
        cases.append(fwd_case(f"prd6656 f ({bq},{bk})", 4, 12, 32, 6656,
                              bq, bk, kv=6528))
    # padded to 7168 = 7*1024 (pad 640 keys; needs block_k > 640)
    cases.append(fwd_case("prd7168 f (512,1024)", 4, 12, 32, 7168,
                          512, 1024, kv=6528))
    # grads: shipped plan vs the balanced candidates
    cases.append(grad_case("prd6528 g (2176,128)", 4, 12, 32, 6528,
                           2176, 128))
    cases.append(grad_case("prd6528 g (384,384)", 4, 12, 32, 6528,
                           384, 384))
    cases.append(grad_case("prd6656 g (512,512)", 4, 12, 32, 6656,
                           512, 512, kv=6528))
    cases.append(grad_case("prd6656 g (1664,256)", 4, 12, 32, 6656,
                           1664, 256, kv=6528))
    cases.append(grad_case("prd7168 g (512,1024)", 4, 12, 32, 7168,
                           512, 1024, kv=6528))
    res = bench_table(cases, inner=10, rounds=3)
    print("\nRESULT " + " | ".join(f"{k} {v:.2f}" for k, v in res.items()),
          flush=True)


if __name__ == "__main__":
    main()
