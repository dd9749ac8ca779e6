"""Perf probe #3: attribute the ViT-L masked-pretrain step WITH flash on
(probe2's numbers predate the kernel; bench r3 measures 575.9 ms at bs8
16f@256 = 35.9% MFU — find where the rest goes).

Programs (each jitted separately; chained-carry timing with a FINAL
``float()`` fetch inside the timed region — block_until_ready alone proved
unreliable through the tunnel: programs whose values are never fetched
measured 5-12 ms for work that takes 400+ ms):
  A. target fwd: encoder full 2048 tokens, no grad
  B. loss fwd only (target + 2x ctx fwd + 2x predictor), no grad
  C. value_and_grad of the loss (grads reduced to global-norm scalar)
  D. full train step (the bench program, donated) — run LAST: donation
     consumes the state
  E. merged ctx fwd estimate: both mask configs batch-concatenated into
     ONE encoder call ([2B, Kmax] padded) vs two separate calls.

Run: timeout 1700 python -u scripts/perf_probe3.py
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


MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]

N_STEPS = 8


def timed(name, fn, first_args, make_args, n=N_STEPS, chains=2):
    out = fn(*first_args)  # compile
    v0 = float(out)
    best = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*make_args(out))
        v = float(out)  # forces real completion of the whole chain
        best.append((time.perf_counter() - t0) / n * 1e3)
    log(f"{name}: {min(best):.1f} ms  (chains={[round(b,1) for b in best]}, v={v:.4f})")
    return min(best)


def main():
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.ops.masking import apply_mask
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, jepa_loss,
        make_optimizer, make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    B, T, S = 8, 16, 256
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    log(f"mask lengths ctx={[m.shape[1] for m in me]} pred={[m.shape[1] for m in mp]}")
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]), jnp.asarray(mp[0])
    )
    state = TrainState.create(params, target, tx)
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)

    def fresh_masks():
        coll.step()
        a, b = coll(T, B)
        return tuple(map(jnp.asarray, a)), tuple(map(jnp.asarray, b))

    me_j = tuple(map(jnp.asarray, me))
    mp_j = tuple(map(jnp.asarray, mp))

    # ---- A: target fwd
    @jax.jit
    def target_fwd(tp, c):
        h = encoder.apply({"params": tp}, c)
        return h.astype(jnp.float32).mean()

    timed("A target fwd (2048 tok)", target_fwd, (state.target_params, clips),
          lambda o: (state.target_params, clips + o.astype(jnp.bfloat16) * 0))

    # ---- B: full loss fwd
    def loss_of(params, tp, c, menc, mpred):
        h_all = encoder.apply({"params": tp}, c).astype(jnp.float32)
        h_all = (h_all - h_all.mean(-1, keepdims=True)) / jnp.sqrt(
            h_all.var(-1, keepdims=True) + 1e-6)
        h_list = [apply_mask(h_all, m) for m in mpred]
        z_list = []
        for i, (a, b) in enumerate(zip(menc, mpred)):
            z = encoder.apply({"params": params["encoder"]}, c, [a])
            z = predictor.apply({"params": params["predictor"]}, z, a, b, i)
            z_list.append(z)
        return jepa_loss(z_list, h_list, 1.0)

    loss_j = jax.jit(loss_of)
    timed("B loss fwd (target + 2x ctx+pred)", loss_j,
          (state.params, state.target_params, clips, me_j, mp_j),
          lambda o: (state.params, state.target_params,
                     clips + o.astype(jnp.bfloat16) * 0, *fresh_masks()))

    # ---- C dropped: un-donated value_and_grad OOMs at bs8 ViT-L (params +
    # grads + opt state all resident); infer backward+opt as D - B.

    # ---- E: separate vs merged ctx encoder fwd (before D donates the state)
    @jax.jit
    def ctx_sep(p, c, menc):
        s = 0.0
        for a in menc:
            s = s + encoder.apply({"params": p}, c, [a]).astype(jnp.float32).mean()
        return s

    timed("E1 ctx fwd separate (2 calls)", ctx_sep,
          (state.params["encoder"], clips, me_j),
          lambda o: (state.params["encoder"],
                     clips + o.astype(jnp.bfloat16) * 0, fresh_masks()[0]))

    kmax = max(m.shape[1] for m in me_j)
    c2 = jnp.concatenate([clips, clips], 0)

    @jax.jit
    def ctx_merged(p, c, menc):
        padded = jnp.concatenate(
            [jnp.pad(m, ((0, 0), (0, kmax - m.shape[1])), mode="edge")
             for m in menc], 0)
        return encoder.apply({"params": p}, c, [padded]).astype(jnp.float32).mean()

    timed(f"E2 ctx fwd merged (1 call, padded to {kmax})", ctx_merged,
          (state.params["encoder"], c2, me_j),
          lambda o: (state.params["encoder"],
                     c2 + o.astype(jnp.bfloat16) * 0, fresh_masks()[0]))

    # ---- D: full step (donated) — LAST
    step = jax.jit(make_train_step(encoder, predictor, tx, hp), donate_argnums=(0,))
    box = [state]

    def one(c, masks):
        box[0], m = step(box[0], c, *masks)
        return m["loss"]

    out = one(clips, (me_j, mp_j))
    float(out)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        out = one(clips + out.astype(jnp.bfloat16) * 0, fresh_masks())
    v = float(out)
    log(f"D full step (donated): {(time.perf_counter()-t0)/N_STEPS*1e3:.1f} ms (loss={v:.4f})")

    log("DONE")


if __name__ == "__main__":
    main()
