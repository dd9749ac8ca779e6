"""Step-level bucket attribution for the ViT-L pretrain step (r3).

Only step-level timing is trustworthy on this platform (tunnel dispatch
~2 ms, fori_loop iter ~0.6 ms pollute micro-benches). Variants (each a full
jitted train step, timed with chained clips + value fetch):

  base       shipped step: adamw(chain) + ema tree passes
  noopt      p <- p - 1e-9 * g, no adam/wd/ema  (isolates optimizer+EMA)
  fusedopt   single tree_map computing adam+wd+lr+apply+ema in one pass
  nolnup     model LNs run in bf16 (diagnostic only — isolates the fp32
             upcast+reduce cost of LayerNorm)

Run: timeout 1700 python -u scripts/probe_step_buckets.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.pretrain import (
    PretrainHParams, build_models, init_params, make_optimizer, make_train_step,
)
from vjepa2_tpu.train.state import TrainState
from vjepa2_tpu.core.schedulers import cosine_wd, ema_momentum, warmup_cosine_lr
from vjepa2_tpu.ops.masking import apply_mask

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]

B, T, S = 8, 16, 256
STEPS = 6


def make_fused_step(encoder, predictor, hp):
    """Train step with adam+wd+lr+apply+ema in ONE tree traversal."""

    b1, b2 = hp.betas
    eps = hp.eps

    def train_step(state: TrainState, clips, masks_enc, masks_pred):
        momentum = ema_momentum(state.step, ema_start=hp.ema[0], ema_end=hp.ema[1],
                                t_max=hp.total_steps)
        h_all = encoder.apply({"params": state.target_params}, clips)
        h_all = h_all.astype(jnp.float32)
        h_all = (h_all - h_all.mean(-1, keepdims=True)) / jnp.sqrt(
            h_all.var(-1, keepdims=True) + 1e-6)
        h_all = jax.lax.stop_gradient(h_all)
        h_list = [apply_mask(h_all, mp) for mp in masks_pred]

        def loss_fn(params):
            z_list = []
            for i, (me, mp) in enumerate(zip(masks_enc, masks_pred)):
                z = encoder.apply({"params": params["encoder"]}, clips, [me])
                z = predictor.apply({"params": params["predictor"]}, z, me, mp, i)
                z_list.append(z)
            loss = 0.0
            for z, h in zip(z_list, h_list):
                loss = loss + jnp.abs(z.astype(jnp.float32) - h).mean()
            return loss / len(z_list)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)

        # optax.scale_by_adam state layout: (count, mu, nu) — reuse it
        adam_state, wd_state, lr_state = state.opt_state
        count = adam_state.count
        cnt = count + 1
        lr = warmup_cosine_lr(wd_state.count, warmup_steps=hp.warmup_steps,
                              start_lr=hp.start_lr, ref_lr=hp.lr,
                              t_max=hp.total_steps, final_lr=hp.final_lr)
        wd = cosine_wd(wd_state.count, ref_wd=hp.wd, t_max=hp.total_steps,
                       final_wd=hp.final_wd)
        bc1 = 1.0 - b1 ** cnt.astype(jnp.float32)
        bc2 = 1.0 - b2 ** cnt.astype(jnp.float32)

        def upd(p, g, mu, nu):
            mu2 = b1 * mu + (1 - b1) * g
            nu2 = b2 * nu + (1 - b2) * g * g
            u = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
            if p.ndim >= 2:
                u = u + wd * p
            return p - lr * u, mu2, nu2

        flat_p, tdef = jax.tree_util.tree_flatten(state.params)
        flat_g = jax.tree_util.tree_flatten(grads)[0]
        flat_mu = jax.tree_util.tree_flatten(adam_state.mu)[0]
        flat_nu = jax.tree_util.tree_flatten(adam_state.nu)[0]
        out = [upd(p, g, mu, nu) for p, g, mu, nu in
               zip(flat_p, flat_g, flat_mu, flat_nu)]
        params = jax.tree_util.tree_unflatten(tdef, [o[0] for o in out])
        mu_t = jax.tree_util.tree_unflatten(tdef, [o[1] for o in out])
        nu_t = jax.tree_util.tree_unflatten(tdef, [o[2] for o in out])
        target = jax.tree_util.tree_map(
            lambda t, o: t * momentum + (1.0 - momentum) * o,
            state.target_params, params["encoder"])
        new_adam = adam_state._replace(count=cnt, mu=mu_t, nu=nu_t)
        new_opt = (new_adam,
                   wd_state._replace(count=wd_state.count + 1),
                   lr_state._replace(count=lr_state.count + 1))
        new_state = state.replace(step=state.step + 1, params=params,
                                  target_params=target, opt_state=new_opt)
        return new_state, {"loss": loss}

    return train_step


def make_noopt_step(encoder, predictor, hp):
    def train_step(state: TrainState, clips, masks_enc, masks_pred):
        h_all = encoder.apply({"params": state.target_params}, clips)
        h_all = h_all.astype(jnp.float32)
        h_all = (h_all - h_all.mean(-1, keepdims=True)) / jnp.sqrt(
            h_all.var(-1, keepdims=True) + 1e-6)
        h_all = jax.lax.stop_gradient(h_all)
        h_list = [apply_mask(h_all, mp) for mp in masks_pred]

        def loss_fn(params):
            z_list = []
            for i, (me, mp) in enumerate(zip(masks_enc, masks_pred)):
                z = encoder.apply({"params": params["encoder"]}, clips, [me])
                z = predictor.apply({"params": params["predictor"]}, z, me, mp, i)
                z_list.append(z)
            loss = 0.0
            for z, h in zip(z_list, h_list):
                loss = loss + jnp.abs(z.astype(jnp.float32) - h).mean()
            return loss / len(z_list)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        params = jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, state.params, grads)
        new_state = state.replace(step=state.step + 1, params=params)
        return new_state, {"loss": loss}

    return train_step


def time_step(step, state_box, clips, coll):
    """bench.py methodology: fresh masks per step + loss chained into clips."""
    carry = jnp.zeros([], jnp.float32)
    # compile + warm
    coll.step()
    me, mp = coll(T, B)
    state_box[0], m = step(state_box[0], clips,
                           tuple(map(jnp.asarray, me)), tuple(map(jnp.asarray, mp)))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        coll.step()
        me, mp = coll(T, B)
        state_box[0], m = step(
            state_box[0], clips + carry.astype(jnp.bfloat16) * 0,
            tuple(map(jnp.asarray, me)), tuple(map(jnp.asarray, mp)))
        carry = m["loss"]
    float(carry)
    return (time.perf_counter() - t0) / STEPS * 1000


def main():
    results = {}
    for variant in ("base", "fusedopt", "noopt", "nolnup"):
        dtype = jnp.bfloat16
        encoder, predictor = build_models(
            model_name="vit_large", crop_size=S, num_frames=T,
            pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
            use_rope=True, num_mask_tokens=2, use_flash=True, dtype=dtype,
        )
        import vjepa2_tpu.models.modules as M
        M.LN_UPCAST = variant != "nolnup"
        coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
        coll.step()
        me0, mp0 = coll(T, B)
        hp = PretrainHParams(ipe=100, epochs=10)
        tx = make_optimizer(hp)
        params, target = init_params(encoder, predictor, 0, (B, T, S, S, 3),
                                     jnp.asarray(me0[0]), jnp.asarray(mp0[0]))
        state = TrainState.create(params, target, tx)
        if variant == "fusedopt":
            step_fn = make_fused_step(encoder, predictor, hp)
        elif variant == "noopt":
            step_fn = make_noopt_step(encoder, predictor, hp)
        else:
            step_fn = make_train_step(encoder, predictor, tx, hp)
        step = jax.jit(step_fn, donate_argnums=(0,))
        rs = np.random.RandomState(0)
        clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
        box = [state]
        ms1 = time_step(step, box, clips, coll)
        ms2 = time_step(step, box, clips, coll)
        results[variant] = min(ms1, ms2)
        print(f"{variant:9s} {min(ms1, ms2):8.1f} ms/step  (runs {ms1:.1f} / {ms2:.1f})",
              flush=True)
        M.LN_UPCAST = True
        # free memory between variants
        del state, box, step, params, target
    print(results)


if __name__ == "__main__":
    main()
