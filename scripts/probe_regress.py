"""Step-level bisect of the r3 pretrain regression (537.6 -> 563 ms).

Each variant runs the FULL ViT-L bs8 16f@256 train step in its own
subprocess (clean jit caches / module state), timed per methodology v4
(chained carries, one fetch per window, min over rounds). Variants toggle
exactly one of the r3 changes:

  full         everything as shipped (expected ~563)
  nostackpad   STACK_PAD=False     -> per-call pad/slice around flash calls
  noropehoist  ROPE_HOIST=False    -> per-call rope expand+permute
  oldblocks    force fwd 1024x1024 + bwd=fwd (the r2 block policy) via a
               flash_attention_bhnd wrapper
  segpad       convert kv_valid tail masks back into fp32 segment columns
               (the r2 pad mechanism) via the same wrapper
  oldall       nostackpad + noropehoist + oldblocks + segpad (~r2 semantics;
               expected ~537)

Run: timeout 3000 python -u scripts/probe_regress.py [variant ...]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["full", "nostackpad", "noropehoist", "oldblocks", "segpad", "oldall"]


def run_variant(name: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vjepa2_tpu.models import vision_transformer as vt
    from vjepa2_tpu.ops import flash_attention as fa

    if name in ("nostackpad", "oldall"):
        vt.STACK_PAD = False
    if name in ("noropehoist", "oldall"):
        vt.ROPE_HOIST = False
    if name in ("oldblocks", "segpad", "oldall"):
        orig = fa.flash_attention_bhnd

        def wrapper(q, k, v, **kw):
            if name in ("oldblocks", "oldall"):
                n, m = q.shape[2], k.shape[2]
                kw["block_q"] = fa.pick_block(n, 1024)
                kw["block_k"] = fa.pick_block(m, 1024)
                kw["bwd_block_q"] = kw["block_q"]
                kw["bwd_block_k"] = kw["block_k"]
            if name in ("segpad", "oldall") and kw.get("kv_valid_len") is not None:
                kvl = kw.pop("kv_valid_len")
                B, _, n, _ = q.shape
                seg = jnp.where(jnp.arange(n) < kvl, 0,
                                jnp.iinfo(jnp.int32).max).astype(jnp.int32)
                kw["segment_ids"] = jnp.broadcast_to(seg[None], (B, n))
            kw.pop("kv_valid_len", None) if name == "oldall" else None
            return orig(q, k, v, **kw)

        fa.flash_attention_bhnd = wrapper
        # attention.py imports the module, not the symbol — patch sticks

    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, make_optimizer,
        make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    MASK_CFGS = [
        {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
         "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
        {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
         "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
    ]
    B, T, S = 8, 16, 256
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]),
        jnp.asarray(mp[0]))
    state = TrainState.create(params, target, tx)
    step_fn = jax.jit(make_train_step(encoder, predictor, tx, hp), donate_argnums=(0,))
    clips0 = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3), jnp.bfloat16)
    me = tuple(jnp.asarray(x) for x in me)
    mp = tuple(jnp.asarray(x) for x in mp)

    def one(carry):
        nonlocal state
        clips = clips0 + carry.astype(jnp.bfloat16)
        state, m = step_fn(state, clips, me, mp)
        return m["loss"]

    t0 = time.perf_counter()
    c = one(jnp.float32(0.0)) * 1e-30
    float(c)
    compile_s = time.perf_counter() - t0
    # warmup post-compile step (first dispatch pays donation/layout shuffle)
    c = one(c) * 1e-30
    float(c)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            c = one(c) * 1e-30
        float(c)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"RESULT {name} {best * 1e3:.1f} ms/step (compile {compile_s:.0f}s)",
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] in VARIANTS and len(sys.argv) == 2 \
            and os.environ.get("_PROBE_CHILD"):
        run_variant(sys.argv[1])
        return
    names = sys.argv[1:] or VARIANTS
    env = dict(os.environ, _PROBE_CHILD="1")
    for name in names:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), name],
            env=env, timeout=900, capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            print(f"RESULT {name} FAILED rc={r.returncode}\n"
                  + "\n".join(r.stderr.splitlines()[-6:]), flush=True)


if __name__ == "__main__":
    main()
