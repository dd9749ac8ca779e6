"""Perf probe #2: attribute ViT-L masked-pretrain step time (bs8 16f@256).

Components timed separately (each a jitted program, chained-carry timing):
  A. target fwd: encoder on full clips, no grad
  B. ctx fwd:   encoder on masked tokens + predictor, no grad
  C. loss+grad: value_and_grad of the full pretrain loss (target inside,
     stop_gradient), grads reduced to a global-norm scalar (no state update)
  D. full step, no donation
  E. full step, donated (the bench configuration)

Writes JSON lines to .perf/probe2.jsonl.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

OUT = open("/root/repo/.perf/probe2.jsonl", "a", buffering=1)


def emit(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]


def main():
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, jepa_loss,
        make_optimizer, make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState
    from vjepa2_tpu.ops.masking import apply_mask

    B, T, S = 8, 16, 256
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    masks_enc, masks_pred = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    t0 = time.perf_counter()
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3),
        jnp.asarray(masks_enc[0]), jnp.asarray(masks_pred[0]),
    )
    emit(what="init_s", s=round(time.perf_counter() - t0, 1))
    me = tuple(jnp.asarray(m) for m in masks_enc)
    mp = tuple(jnp.asarray(m) for m in masks_pred)
    emit(what="mask_shapes", enc=[list(m.shape) for m in me], pred=[list(m.shape) for m in mp])
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.float32)

    def timeit(name, fn, steps=8):
        t0 = time.perf_counter()
        carry = fn(jnp.float32(0.0))
        float(carry)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = fn(carry * 1e-30)
        float(carry)
        dt = (time.perf_counter() - t0) / steps
        emit(what=name, ms=round(dt * 1e3, 1), compile_s=round(compile_s, 1))
        return dt

    # NB round-1 lesson: never close over big device arrays — they get
    # embedded in the lowered program and the tunnel's remote_compile HTTP
    # endpoint breaks ("Broken pipe") on multi-MB programs. Everything is an
    # explicit argument.

    # A: target fwd (full sequence, no grad)
    @jax.jit
    def target_fwd(tgt, x, c):
        h = encoder.apply({"params": tgt}, x + c)
        return h.astype(jnp.float32).mean() * 1e-30

    timeit("A_target_fwd_full", lambda c: target_fwd(target, clips, c))

    # B: ctx fwd (masked enc + predictor), no grad
    @jax.jit
    def ctx_fwd(prm, x, me, mp, c):
        acc = jnp.float32(0.0)
        for i in range(len(me)):
            z = encoder.apply({"params": prm["encoder"]}, x + c, [me[i]])
            zp = predictor.apply({"params": prm["predictor"]}, z, me[i], mp[i], i)
            acc += zp.astype(jnp.float32).mean()
        return acc * 1e-30

    timeit("B_ctx_fwd_masked", lambda c: ctx_fwd(params, clips, me, mp, c))

    # C: loss + grads, no optimizer
    def loss_fn(prm, tgt, x, me, mp, c):
        h = encoder.apply({"params": tgt}, x + c)
        h = h.astype(jnp.float32)
        h = (h - h.mean(-1, keepdims=True)) / jnp.sqrt(h.var(-1, keepdims=True) + 1e-6)
        h = jax.lax.stop_gradient(h)
        h_list = [apply_mask(h, m) for m in mp]
        z_list = []
        for i in range(len(me)):
            z = encoder.apply({"params": prm["encoder"]}, x + c, [me[i]])
            zp = predictor.apply({"params": prm["predictor"]}, z, me[i], mp[i], i)
            z_list.append(zp)
        return jepa_loss(z_list, h_list, 1.0)

    @jax.jit
    def grad_step(prm, tgt, x, me, mp, c):
        loss, grads = jax.value_and_grad(loss_fn)(prm, tgt, x, me, mp, c)
        gn = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))), grads, jnp.float32(0.0)
        )
        return (loss + gn) * 1e-30

    timeit("C_loss_and_grads", lambda c: grad_step(params, target, clips, me, mp, c))

    # D/E: full train step without/with donation
    step_fn = make_train_step(encoder, predictor, tx, hp)

    step_nodonate = jax.jit(step_fn)
    st = [TrainState.create(params, target, tx)]

    def full_nodonate(c):
        coll.step()
        menc, mpred = coll(T, B)
        st[0], metrics = step_nodonate(
            st[0], clips + c, tuple(map(jnp.asarray, menc)), tuple(map(jnp.asarray, mpred))
        )
        return metrics["loss"] * 1e-30

    timeit("D_full_step_nodonate", full_nodonate)

    step_donate = jax.jit(step_fn, donate_argnums=(0,))
    st2 = [TrainState.create(params, target, tx)]

    def full_donate(c):
        coll.step()
        menc, mpred = coll(T, B)
        st2[0], metrics = step_donate(
            st2[0], clips + c, tuple(map(jnp.asarray, menc)), tuple(map(jnp.asarray, mpred))
        )
        return metrics["loss"] * 1e-30

    timeit("E_full_step_donate", full_donate)
    emit(what="done")


if __name__ == "__main__":
    main()
