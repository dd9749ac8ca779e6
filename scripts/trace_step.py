"""Device-trace attribution of the ViT-L pretrain step (r3).

Captures jax.profiler.trace of a few steps, parses the TPU device lane from
plugins/profile/*/*.trace.json.gz, and prints per-op-class totals so the
537 ms step is attributed with names instead of guesses.

Run: timeout 1700 python -u scripts/trace_step.py [--fuse-ln qkv,mlp]
(--fuse-ln mirrors bench.py: trace the LN-prologue-fused step variant.)
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.pretrain import (
    PretrainHParams, build_models, init_params, make_optimizer, make_train_step,
)
from vjepa2_tpu.train.state import TrainState

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]
B, T, S = 8, 16, 256  # --cooldown overrides to the 64f@256 bs12 accum3 shape


def classify(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "flash/pallas"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(unnamed)"
    if "dot" in n or "conv" in n:
        return "dot/conv"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "gather" in n or "scatter" in n or "dynamic" in n:
        return "gather/scatter"
    if "reduce" in n:
        return "reduce"
    if "convert" in n:
        return "convert"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    global B, T, S
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuse-ln", default="",
                    help="comma list of LN prologues to fuse: qkv,mlp")
    ap.add_argument("--cooldown", action="store_true",
                    help="trace the 64f@256 bs12 accum3 remat cooldown step "
                         "(VERDICT r5: attribute the 29%% MFU)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat-policy", default=None,
                    help="remat policy for --cooldown (models.modules."
                         "resolve_remat_policy); default: the shipped "
                         "cooldown default is save_attn_qkv, but this "
                         "script traces 'full' unless told otherwise so "
                         "historical traces stay comparable")
    args = ap.parse_args()
    import vjepa2_tpu.models.modules as _M
    try:
        _M.set_ln_fusions(args.fuse_ln)
    except ValueError as e:
        raise SystemExit(f"--fuse-ln: {e}")
    sel = {s.strip() for s in args.fuse_ln.split(",") if s.strip()}
    trace_dir = "/tmp/jax_trace_step" + ("_" + "_".join(sorted(sel)) if sel else "")
    accum, remat = 1, False
    if args.cooldown:
        B, T, S = 12, 64, 256
        accum, remat = 3, True
        trace_dir = "/tmp/jax_trace_cooldown"
        if args.remat_policy:
            trace_dir += "_" + args.remat_policy
    os.system(f"rm -rf {trace_dir}")

    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
        use_activation_checkpointing=remat, remat_policy=args.remat_policy,
    )
    b = B // accum

    def _shape(clips, menc, mpred):
        if accum == 1:
            return (clips, tuple(map(jnp.asarray, menc)),
                    tuple(map(jnp.asarray, mpred)))
        return (clips.reshape(accum, b, *clips.shape[1:]),
                tuple(jnp.asarray(m).reshape(accum, b, -1) for m in menc),
                tuple(jnp.asarray(m).reshape(accum, b, -1) for m in mpred))

    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me0, mp0 = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(encoder, predictor, 0, (b, T, S, S, 3),
                                 jnp.asarray(me0[0][:b]), jnp.asarray(mp0[0][:b]))
    state = TrainState.create(params, target, tx)
    step = jax.jit(make_train_step(encoder, predictor, tx, hp, grad_accum=accum),
                   donate_argnums=(0,))
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    c0, me, mp = _shape(clips, me0, mp0)

    state, m = step(state, c0, me, mp)
    print("compiled; loss", float(m["loss"]), flush=True)

    carry = m["loss"]
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            coll.step()
            menc, mpred = coll(T, B)
            ci, mei, mpi = _shape(clips + carry.astype(jnp.bfloat16) * 0,
                                  menc, mpred)
            state, m = step(state, ci, mei, mpi)
            carry = m["loss"]
        float(carry)

    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    print("trace files:", files)
    evs = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        evs.extend(data.get("traceEvents", []))
    # find the device pid
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = [p for p, n in pids.items() if "TPU" in n or "device" in n.lower()]
    print("processes:", pids)
    tids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and e["pid"] in dev_pids:
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    print("device threads:", tids)

    by_class = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in evs:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        tname = tids.get((e["pid"], e["tid"]), "")
        if "XLA Ops" not in tname and "Ops" not in tname:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_class[classify(name)] += dur
        by_name[name] += dur
        total += dur
    n_steps = args.steps
    print(f"\ntotal device op time: {total:.1f} ms over {n_steps} steps "
          f"= {total / n_steps:.1f} ms/step")
    print("\nby class (ms/step):")
    for c, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {c:20s} {v / n_steps:8.1f}")
    print("\ntop 30 ops (ms/step):")
    for name, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v / n_steps:8.2f}  {name[:110]}")


if __name__ == "__main__":
    main()
