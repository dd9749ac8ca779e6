"""Why doesn't the persistent compile cache hit across processes? (VERDICT r4/#5)

Observed: the SAME ViT-L train step compiled at 14:40 (probe), 14:55 (bench)
and 15:02 (LN probe) in one session — three ~150-290 s tunnel compiles, three
distinct `jit_train_step-*` cache entries. If the serialized module text is
process-dependent, the cache key (a hash over canonicalized StableHLO +
compile options) can never hit.

This probe stays on CPU: it lowers the full train step in THIS process,
hashes the canonicalized module text, and compares against a stored hash
from a previous invocation. Run twice:

    JAX_PLATFORMS=cpu python scripts/probe_compile_cache.py
    JAX_PLATFORMS=cpu python scripts/probe_compile_cache.py

If run 2 prints MATCH, module text is process-stable and the miss is in key
construction (compile options / env); if MISMATCH, it diffs the first
differing lines — the source of drift.
"""

import difflib
import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

STATE = "/tmp/compile_cache_probe"


def main():
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, make_optimizer,
        make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    import bench

    # vit_tiny keeps CPU tracing fast; drift, if any, is structural not
    # size-dependent
    B, T, S = 2, 4, 64
    encoder, predictor = build_models(
        model_name="vit_tiny", crop_size=S, num_frames=T,
        pred_depth=2, pred_embed_dim=64, pred_num_heads=2,
        use_rope=True, num_mask_tokens=2, use_flash=False, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(bench.MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]),
        jnp.asarray(mp[0]))
    state = TrainState.create(params, target, tx)
    step = jax.jit(make_train_step(encoder, predictor, tx, hp),
                   donate_argnums=(0,))
    clips = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3),
                        jnp.bfloat16)
    lowered = step.lower(state, clips,
                         tuple(jnp.asarray(x) for x in me),
                         tuple(jnp.asarray(x) for x in mp))
    text = lowered.as_text()
    # strip loc() metadata the way the cache key canonicalization should
    stripped = re.sub(r"loc\(.*?\)", "loc()", text)
    stripped = re.sub(r"#loc\d* = .*", "", stripped)
    h_raw = hashlib.sha256(text.encode()).hexdigest()[:16]
    h_strip = hashlib.sha256(stripped.encode()).hexdigest()[:16]
    print(f"module lines={len(text.splitlines())} raw={h_raw} "
          f"stripped={h_strip}")
    prev_raw = prev_strip = prev_text = None
    if os.path.exists(STATE + ".hash"):
        with open(STATE + ".hash") as f:
            prev_raw, prev_strip = f.read().split()
        with open(STATE + ".txt") as f:
            prev_text = f.read()
    with open(STATE + ".hash", "w") as f:
        f.write(f"{h_raw} {h_strip}")
    with open(STATE + ".txt", "w") as f:
        f.write(stripped)
    if prev_raw is None:
        print("first run; run again in a fresh process")
        return
    print(f"raw: {'MATCH' if prev_raw == h_raw else 'MISMATCH'}; "
          f"stripped: {'MATCH' if prev_strip == h_strip else 'MISMATCH'}")
    if prev_strip != h_strip:
        diff = list(difflib.unified_diff(
            prev_text.splitlines(), stripped.splitlines(), lineterm="",
            n=1))
        shown = 0
        for line in diff:
            if line.startswith(("+", "-")) and not line.startswith(("+++", "---")):
                print(line[:200])
                shown += 1
                if shown >= 40:
                    break


if __name__ == "__main__":
    main()
