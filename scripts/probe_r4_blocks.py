"""Step-level A/B of the r3->r4 pretrain regression suspects (VERDICT #1).

BENCH_r02 measured the ViT-L bs8 16f@256 step at 539.8 ms; BENCH_r03 at
712.2 ms (agreement 0.9989).  The builder's own r3 probe had the shipped
variant at 533.8 ms BEFORE commit 221d074 capped encoder-width forward
flash blocks at 512x1024 (never A/B'd on hardware: tunnel down).  Each
variant below runs the FULL ViT-L train step (bench.py --mode pretrain
setup, identical mask seeds) in its own subprocess:

  ship          current defaults (FWD_CAP_WIDE = (512, 1024))
  cap1024       FWD_CAP_WIDE = (1024, 1024)   [pre-221d074 policy]
  fullN         FWD_CAP_WIDE = None           [q 1024 x k full-N]
  cap1024_v64   cap1024 + --xla_tpu_scoped_vmem_limit_kib=65536
  fullN_v64     fullN   + --xla_tpu_scoped_vmem_limit_kib=65536
  bwdfwd        ship fwd caps, bwd blocks = fwd blocks (pre-narrowing)

A compile failure (scoped-VMEM) is itself a result: 221d074's rationale
was that cap1024 stopped compiling inside the full program.  The v64
variants test whether raising XLA's scoped-VMEM budget (the MaxText v5e
trick) unlocks the fast blocks reliably.

Run: timeout 4500 python -u scripts/probe_r4_blocks.py [variant ...]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["ship", "cap1024", "fullN", "cap1024_v64", "fullN_v64", "bwdfwd"]
VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"


def run_variant(name: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vjepa2_tpu.ops import flash_attention as fa

    if name.startswith("cap1024"):
        fa.FWD_CAP_WIDE = (1024, 1024)
    elif name.startswith("fullN"):
        fa.FWD_CAP_WIDE = None
    elif name == "bwdfwd":
        orig = fa.flash_attention_bhnd

        def wrapper(q, k, v, **kw):
            if q.shape[-1] >= 64 and kw.get("bwd_block_q") is None:
                n, m = q.shape[2], k.shape[2]
                bq, bk = kw.get("block_q", fa.DEFAULT_BLOCK_Q), kw.get(
                    "block_k", fa.DEFAULT_BLOCK_K)
                bq, bk = fa.pick_block(n, bq), fa.pick_block(m, bk)
                cap_q, cap_k = fa.FWD_CAP_WIDE
                if bq * bk > cap_q * cap_k and bk > cap_k:
                    bk = fa.pick_block(m, cap_k)
                if bq * bk > cap_q * cap_k and bq > cap_q:
                    bq = fa.pick_block(n, cap_q)
                kw["bwd_block_q"], kw["bwd_block_k"] = bq, bk
            return orig(q, k, v, **kw)

        fa.flash_attention_bhnd = wrapper

    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, make_optimizer,
        make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    # bench.py MASK_CFGS + collator seeding, so mask lengths match the
    # driver capture exactly (ctx [578, 173], pred [1045, 1489])
    import bench
    B, T, S = 8, 16, 256
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
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
    step_fn = jax.jit(make_train_step(encoder, predictor, tx, hp),
                      donate_argnums=(0,))
    clips0 = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3),
                         jnp.bfloat16)
    me = tuple(jnp.asarray(x) for x in me)
    mp = tuple(jnp.asarray(x) for x in mp)
    lens = ([int(x.shape[-1]) for x in me], [int(x.shape[-1]) for x in mp])

    def one(carry):
        nonlocal state
        clips = clips0 + carry.astype(jnp.bfloat16)
        state, m = step_fn(state, clips, me, mp)
        return m["loss"]

    t0 = time.perf_counter()
    c = one(jnp.float32(0.0)) * 1e-30
    float(c)
    compile_s = time.perf_counter() - t0
    c = one(c) * 1e-30
    float(c)  # warmup post-compile step (donation/layout shuffle)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            c = one(c) * 1e-30
        float(c)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"RESULT {name} {best * 1e3:.1f} ms/step (compile {compile_s:.0f}s, "
          f"masks {lens})", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] in VARIANTS and len(sys.argv) == 2 \
            and os.environ.get("_PROBE_CHILD"):
        run_variant(sys.argv[1])
        return
    names = sys.argv[1:] or VARIANTS
    for name in names:
        env = dict(os.environ, _PROBE_CHILD="1")
        if name.endswith("_v64"):
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + VMEM_FLAG).strip()
            # a changed XLA_FLAGS invalidates nothing in the persistent
            # compile cache keying we rely on; the variant pays a full
            # compile either way (new program)
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), name],
            env=env, timeout=1200, capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            tail = "\n".join((r.stderr or "").splitlines()[-8:])
            print(f"RESULT {name} FAILED rc={r.returncode}\n{tail}", flush=True)


if __name__ == "__main__":
    main()
