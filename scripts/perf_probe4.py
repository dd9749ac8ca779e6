"""Probe #4: split the pretrain backward between ctx encoder and predictor.

Times value_and_grad of (a) ctx encoder forward alone, (b) predictor alone
(encoder outputs precomputed, stop-gradient), (c) both chained — at the
exact bs8 16f@256 ViT-L step shapes. Compare with probe3's D-B = 283 ms
backward+opt total.
Run: timeout 1700 python -u scripts/perf_probe4.py
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


def timed(name, fn, first_args, make_args, n=8, chains=2):
    out = fn(*first_args)
    float(out)
    best = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*make_args(out))
        float(out)
        best.append((time.perf_counter() - t0) / n * 1e3)
    log(f"{name}: {min(best):.1f} ms (chains={[round(b,1) for b in best]})")
    return min(best)


def main():
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import PretrainHParams, build_models, init_params

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
    params, _ = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]), jnp.asarray(mp[0])
    )
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    me_j = tuple(map(jnp.asarray, me))
    mp_j = tuple(map(jnp.asarray, mp))

    def fresh_masks():
        coll.step()
        a, b = coll(T, B)
        return tuple(map(jnp.asarray, a)), tuple(map(jnp.asarray, b))

    # (a) grad of ctx encoder forwards only
    @jax.jit
    def grad_enc(p, c, menc):
        def loss(p):
            s = 0.0
            for a in menc:
                s = s + encoder.apply({"params": p}, c, [a]).astype(jnp.float32).mean()
            return s
        l, g = jax.value_and_grad(loss)(p)
        import optax
        return l + optax.global_norm(g)

    timed("a) ctx-encoder fwd+bwd (2 cfgs)", grad_enc,
          (params["encoder"], clips, me_j),
          lambda o: (params["encoder"], clips + o.astype(jnp.bfloat16) * 0,
                     fresh_masks()[0]))

    # (b) grad of predictor only (encoder outputs fixed)
    z_list = [jax.jit(lambda p, c, a: encoder.apply({"params": p}, c, [a]))(
        params["encoder"], clips, a) for a in me_j]

    @jax.jit
    def grad_pred(p, zs, menc, mpred):
        def loss(p):
            s = 0.0
            for i, (z, a, b) in enumerate(zip(zs, menc, mpred)):
                s = s + predictor.apply({"params": p}, z, a, b, i
                                        ).astype(jnp.float32).mean()
            return s
        l, g = jax.value_and_grad(loss)(p)
        import optax
        return l + optax.global_norm(g)

    timed("b) predictor fwd+bwd (2 cfgs)", grad_pred,
          (params["predictor"], z_list, me_j, mp_j),
          lambda o: (params["predictor"],
                     [z + o.astype(jnp.bfloat16) * 0 for z in z_list],
                     me_j, mp_j))

    # (c) chained: encoder -> predictor, grads through both
    @jax.jit
    def grad_both(p, c, menc, mpred):
        def loss(p):
            s = 0.0
            for i, (a, b) in enumerate(zip(menc, mpred)):
                z = encoder.apply({"params": p["encoder"]}, c, [a])
                s = s + predictor.apply({"params": p["predictor"]}, z, a, b, i
                                        ).astype(jnp.float32).mean()
            return s
        l, g = jax.value_and_grad(loss)(p)
        import optax
        return l + optax.global_norm(g)

    timed("c) enc+pred fwd+bwd (2 cfgs)", grad_both,
          (params, clips, me_j, mp_j),
          lambda o: (params, clips + o.astype(jnp.bfloat16) * 0, *fresh_masks()))

    log("DONE")


if __name__ == "__main__":
    main()
