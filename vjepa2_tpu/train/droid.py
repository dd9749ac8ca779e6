"""V-JEPA 2-AC post-training on robot trajectories
(reference `app/vjepa_droid/train.py:403-470`).

Per step: frames encoded independently by the frozen target encoder (each
frame duplicated to a fake 2-frame tubelet), then the AC predictor is trained
with (a) teacher-forced next-frame prediction and (b) an autoregressive
rollout of ``auto_steps`` frames; loss is L1 on both against the shifted
target features. LR follows the WSD (warmup-stable-decay) schedule.

The reference's python rollout loop (`train.py:430-435`) is a static-length
loop under jit here — sequence grows by tokens_per_frame per iteration, each
iteration a separately-shaped predictor call, all fused into one XLA program.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from vjepa2_tpu.core.optim import make_adamw
from vjepa2_tpu.core.schedulers import cosine_wd, wsd_lr
from vjepa2_tpu.train.state import TrainState


@dataclass(frozen=True)
class DroidHParams:
    lr: float = 4.25e-4
    start_lr: float = 2e-4
    final_lr: float = 0.0
    warmup_steps: int = 800
    anneal_steps: int = 4000
    total_steps: int = 24000
    wd: float = 0.04
    final_wd: float = 0.4
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    loss_exp: float = 1.0
    auto_steps: int = 2
    normalize_reps: bool = True
    enc_lr_scale: float = 0.0  # >0: carry the encoder in the optimizer (reference parity)


def feature_layernorm(h: jnp.ndarray) -> jnp.ndarray:
    h = h.astype(jnp.float32)
    return (h - h.mean(-1, keepdims=True)) / jnp.sqrt(h.var(-1, keepdims=True) + 1e-6)


def make_droid_optimizer(hp: DroidHParams, params_like=None) -> optax.GradientTransformation:
    """AdamW + WSD LR + cosine WD, with the reference's ``enc_lr_scale``
    param group (`app/vjepa_droid/utils.py:215-227`).

    When the trainable tree carries an "encoder" subtree, its LR is scaled by
    ``hp.enc_lr_scale`` and it is excluded from weight decay. Note the
    reference objective gives the encoder *zero* gradient (the predictor
    consumes target-encoder features only, `train.py:408-427`), and torch
    AdamW skips grad-less params entirely — excluding the encoder from WD
    reproduces that bit-exactly while keeping the optimizer surface faithful.
    """
    lr_fn = functools.partial(
        wsd_lr,
        warmup_steps=hp.warmup_steps,
        anneal_steps=hp.anneal_steps,
        t_max=hp.total_steps,
        start_lr=hp.start_lr,
        ref_lr=hp.lr,
        final_lr=hp.final_lr,
    )
    wd_fn = functools.partial(cosine_wd, ref_wd=hp.wd, t_max=hp.total_steps, final_wd=hp.final_wd)
    lr_scale_tree = None
    mask = None
    if params_like is not None and "encoder" in params_like:
        lr_scale_tree = {
            k: jax.tree_util.tree_map(
                lambda _: hp.enc_lr_scale if k == "encoder" else 1.0, v
            )
            for k, v in params_like.items()
        }
        from vjepa2_tpu.core.optim import wd_mask

        def mask(params):
            base = wd_mask(params)
            return {
                k: (jax.tree_util.tree_map(lambda _: False, v) if k == "encoder" else v)
                for k, v in base.items()
            }

    return make_adamw(
        lr_fn, wd_fn, betas=hp.betas, eps=hp.eps,
        lr_scale_tree=lr_scale_tree, **({"mask": mask} if mask is not None else {}),
    )


def encode_frames(encoder, enc_params, clips: jnp.ndarray) -> jnp.ndarray:
    """Encode each frame independently (frame -> fake 2-frame tubelet).

    clips: [B, T, H, W, C] -> [B, T*N_f, D]
    (reference `train.py:408-415`).
    """
    B, T = clips.shape[0], clips.shape[1]
    frames = clips.reshape((B * T, 1) + clips.shape[2:])
    frames = jnp.repeat(frames, 2, axis=1)  # [B*T, 2, H, W, C]
    h = encoder.apply({"params": enc_params}, frames)  # [B*T, N_f, D]
    return h.reshape(B, T * h.shape[1], h.shape[2])


def make_droid_train_step(encoder, predictor, tx, hp: DroidHParams, tokens_per_frame: int,
                          norm_stats=None, grad_accum: int = 1):
    """Build the jitted AC train step.

    batch: clips [B, T, H, W, C]; actions [B, T-1, 7]; states [B, T, 7];
    extrinsics [B, T, 6] or None.
    norm_stats: (mean, std) for uint8 clips (deferred device normalization,
    `data.normalize_on_device` — same contract as the pretrain step).
    ``grad_accum > 1``: leading microbatch dim on every batch input; a
    lax.scan averages the gradients before ONE update (same contract as
    `pretrain.make_train_step`).
    """
    tpf = tokens_per_frame

    def loss_and_grads(params, target_params, clips, actions, states, extrinsics):
        from vjepa2_tpu.train.pretrain import _device_normalize

        clips = _device_normalize(clips, encoder, norm_stats)
        h = encode_frames(encoder, target_params, clips)
        if hp.normalize_reps:
            h = feature_layernorm(h)
        h = jax.lax.stop_gradient(h)

        def apply_pred(params, z, a, s, e):
            z = predictor.apply({"params": params}, z, a, s, e)
            if hp.normalize_reps:
                z = feature_layernorm(z)
            return z

        def loss_fn(params):
            p = params["predictor"]
            # teacher forcing: predict frames 1..T-1 from frames 0..T-2
            z_tf = apply_pred(
                p,
                h[:, :-tpf],
                actions,
                states[:, :-1],
                None if extrinsics is None else extrinsics[:, :-1],
            )
            # autoregressive rollout
            z = jnp.concatenate([h[:, :tpf], z_tf[:, :tpf]], axis=1)
            for n in range(1, hp.auto_steps):
                e_n = None if extrinsics is None else extrinsics[:, : n + 1]
                z_nxt = apply_pred(p, z, actions[:, : n + 1], states[:, : n + 1], e_n)[:, -tpf:]
                z = jnp.concatenate([z, z_nxt], axis=1)
            z_ar = z[:, tpf:]

            def l1(zz):
                hh = h[:, tpf : zz.shape[1] + tpf]
                d = jnp.abs(zz.astype(jnp.float32) - hh.astype(jnp.float32))
                if hp.loss_exp != 1.0:
                    d = d**hp.loss_exp
                return d.mean() / hp.loss_exp

            jloss = l1(z_tf)
            sloss = l1(z_ar)
            return jloss + sloss, (jloss, sloss)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, clips, actions, states, extrinsics=None):
        if grad_accum == 1:
            (loss, (jloss, sloss)), grads = loss_and_grads(
                state.params, state.target_params, clips, actions, states, extrinsics
            )
        else:
            from vjepa2_tpu.train.accum import scan_accumulate

            z0 = jnp.zeros((), jnp.float32)
            (loss, (jloss, sloss)), grads = scan_accumulate(
                loss_and_grads, state.params, state.target_params,
                (clips, actions, states, extrinsics), (z0, (z0, z0)),
                grad_accum,
            )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {
            "loss": loss,
            "loss_teacher_forcing": jloss,
            "loss_rollout": sloss,
            "grad_norm": optax.global_norm(grads),
        }

    return train_step


def jit_droid_train_step(train_step, mesh, grad_accum: int = 1):
    """jit with the batch (clips/actions/states/extrinsics) sharded over the
    (data, fsdp) axes; state shardings propagate from the placed input state
    (same scheme as `pretrain.jit_train_step`). The reference runs this stage
    data-parallel via DDP (`app/vjepa_droid/train.py:274-276`). With
    ``grad_accum > 1`` the microbatch dim leads and the batch dim is second."""
    from jax.sharding import NamedSharding

    from vjepa2_tpu.train.accum import microbatch_spec

    data_sh = NamedSharding(mesh, microbatch_spec(grad_accum))
    return jax.jit(
        train_step,
        in_shardings=(None, data_sh, data_sh, data_sh, data_sh),
        donate_argnums=(0,),
    )


def init_droid_params(encoder, predictor, seed: int, clip_shape, action_dim: int = 7,
                      train_encoder: bool = False):
    """Init: encoder params become the (frozen) target; predictor params train.

    train_encoder=True additionally carries an encoder copy in the trainable
    tree, matching the reference optimizer surface (`utils.py:215-227`); its
    gradient is structurally zero under this objective, so it stays frozen
    either way (see `make_droid_optimizer`).
    """
    B, T = clip_shape[0], clip_shape[1]
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    frames = jnp.zeros((B * T, 2) + tuple(clip_shape[2:]), jnp.float32)
    # jit init; arrays passed as arguments, never closed over (big closure
    # constants break remote compiles — see the verify skill)
    enc_vars = jax.jit(lambda k, f: encoder.init(k, f))(k1, frames)
    h = jax.jit(lambda v, f: encoder.apply(v, f))(enc_vars, frames)
    tpf = h.shape[1]
    h_full = h.reshape(B, T * tpf, h.shape[2])
    extr0 = (
        jnp.zeros((B, T - 1, action_dim - 1), jnp.float32)  # 6-dim, no gripper
        if getattr(predictor, "use_extrinsics", False)
        else None
    )
    pred_vars = jax.jit(
        lambda k, hh, a, st, e: predictor.init(k, hh, a, st, e)
    )(
        k2,
        h_full[:, :-tpf],
        jnp.zeros((B, T - 1, action_dim), jnp.float32),
        jnp.zeros((B, T - 1, action_dim), jnp.float32),
        extr0,
    )
    params = {"predictor": pred_vars["params"]}
    if train_encoder:
        params["encoder"] = jax.tree_util.tree_map(jnp.copy, enc_vars["params"])
    return params, enc_vars["params"], tpf
