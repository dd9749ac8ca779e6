"""Device-trace attribution of the AC train step (r5s3).

The AC step went 884.5 (r4) -> 572-579 ms/step (54% MFU) this round via
the DN segment-id route + the save_attn_qkv_h remat policy. This probe
records where the remaining time sits: jax.profiler trace of 2 steps at
the bench shape (vit_large encoder + pred24x1024, 8f@256 bs8, remat
save_attn_qkv_h), aggregated by base op name (excluding any `while`
wrapper rows, which double-count their children) and bucketed by
call-site per-exec time so kernel shapes are identifiable.

Run: timeout 2400 python -u scripts/trace_ac.py
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 2
TRACE_DIR = "/tmp/jax_trace_ac"


def main():
    from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY
    from vjepa2_tpu.train.droid import (
        DroidHParams, init_droid_params, make_droid_optimizer,
        make_droid_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    B, T, S = 8, 8, 256
    policy = "save_attn_qkv_h"
    encoder = MODEL_REGISTRY["vit_large"](
        img_size=(S, S), num_frames=2, tubelet_size=2, use_rope=True,
        use_flash=True, use_activation_checkpointing=True,
        remat_policy=policy, dtype=jnp.bfloat16)
    predictor = vit_ac_predictor(
        img_size=(S, S), patch_size=16, num_frames=2 * T, tubelet_size=2,
        embed_dim=encoder.embed_dim, predictor_embed_dim=1024, depth=24,
        num_heads=16, use_flash=True, use_activation_checkpointing=True,
        remat_policy=policy, dtype=jnp.bfloat16)
    hp = DroidHParams(total_steps=1000, warmup_steps=10, anneal_steps=100,
                      auto_steps=2)
    params, enc_params, tpf = init_droid_params(encoder, predictor, 0,
                                                (B, T, S, S, 3))
    tx = make_droid_optimizer(hp, params_like=params)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       target_params=enc_params, opt_state=tx.init(params))
    step = jax.jit(make_droid_train_step(encoder, predictor, tx, hp, tpf),
                   donate_argnums=(0,))
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    actions = jnp.asarray(rs.rand(B, T - 1, 7) * 0.1, jnp.float32)
    states = jnp.asarray(rs.rand(B, T, 7), jnp.float32)

    state, m = step(state, clips, actions, states)
    print("compiled; loss", float(m["loss"]), flush=True)
    os.system(f"rm -rf {TRACE_DIR}")
    carry = m["loss"]
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(STEPS):
            state, m = step(state, clips + carry.astype(jnp.bfloat16) * 0,
                            actions, states)
            carry = m["loss"]
        float(carry)

    files = glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz")
    print("trace files:", files, flush=True)
    evs = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            evs.extend(json.load(fh).get("traceEvents", []))
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev = [p for p, n in pids.items() if "TPU" in n]
    tot = collections.Counter()
    sites = collections.Counter()
    site_t = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev or e.get("tid") != 3:
            continue
        n = e.get("name", "")
        if n.startswith("while"):
            continue  # children are emitted individually
        dur = e.get("dur", 0) / 1e3
        tot[re.sub(r"[.\d]+$", "", n)] += dur
        if "_flash_" in n:
            key = (n.split(".")[0], round(dur, 1))
            sites[key] += 1
            site_t[key] += dur
    print(f"\nper-step totals (ms), {STEPS} steps:")
    s = 0.0
    for k, v in tot.most_common(20):
        print(f"  {v / STEPS:8.1f}  {k}")
        s += v
    print(f"  SUM {s / STEPS:.1f}")
    print("\nkernel call-site buckets (base, ms/exec) -> execs, ms/step:")
    for (b, per), c in sorted(sites.items(), key=lambda kv: -site_t[kv[0]]):
        print(f"  {b:18s} {per:6.1f} ms/exec x{c:4d}  "
              f"{site_t[(b, per)] / STEPS:8.1f} ms/step")


if __name__ == "__main__":
    main()
