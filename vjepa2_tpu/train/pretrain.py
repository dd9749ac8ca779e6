"""JEPA masked-latent pretraining: one jitted, mesh-sharded train step.

Replaces the reference's hot loop (`app/vjepa/train.py:409-471`) — target
forward (stop_gradient) + per-mask context forward + predictor + L1^exp loss
+ AdamW + EMA — with a single ``jax.jit`` program. There are no DDP wrappers
and no GradScaler: gradients all-reduce via sharding propagation over the
mesh, and bf16 compute with fp32 params/optimizer needs no loss scaling.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from vjepa2_tpu.core.mesh import batch_spec, param_spec
from vjepa2_tpu.core.optim import ema_update, make_adamw
from vjepa2_tpu.core.schedulers import cosine_wd, ema_momentum, warmup_cosine_lr
from vjepa2_tpu.models.predictor import VisionTransformerPredictor
from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY, VisionTransformer
from vjepa2_tpu.ops.masking import apply_mask
from vjepa2_tpu.train.state import TrainState


@dataclass(frozen=True)
class PretrainHParams:
    """Optimization hyper-parameters (reference `configs/train/*/..yaml`)."""

    lr: float = 6.25e-4
    start_lr: float = 2e-4
    final_lr: float = 1e-6
    warmup_epochs: float = 40
    epochs: int = 300
    ipe: int = 300
    ipe_scale: float = 1.25
    wd: float = 0.04
    final_wd: float = 0.4
    ema: tuple[float, float] = (0.998, 1.0)
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    loss_exp: float = 1.0

    @property
    def total_steps(self) -> int:
        return int(self.ipe_scale * self.epochs * self.ipe)

    @property
    def warmup_steps(self) -> int:
        return int(self.warmup_epochs * self.ipe)


def build_models(
    model_name: str = "vit_base",
    crop_size: int = 224,
    patch_size: int = 16,
    num_frames: int = 16,
    tubelet_size: int = 2,
    pred_depth: int = 12,
    pred_embed_dim: int = 384,
    pred_num_heads: int | None = None,
    uniform_power: bool = True,
    use_rope: bool = False,
    use_silu: bool = False,
    wide_silu: bool = True,
    use_mask_tokens: bool = True,
    num_mask_tokens: int = 2,
    zero_init_mask_tokens: bool = True,
    use_activation_checkpointing: bool = False,
    remat_policy: str | None = None,
    use_flash: bool = False,
    cp_attend=None,
    dtype=jnp.bfloat16,
) -> tuple[VisionTransformer, VisionTransformerPredictor]:
    """Mirror of reference `app/vjepa/utils.py:init_video_model`.

    ``use_flash`` routes attention through the Pallas kernel (reference's
    use_sdpa flag, `src/models/utils/modules.py:243`); ``cp_attend`` is a
    ring-attention callable from ``seq_sharded_attention`` for context
    parallelism over the mesh (64f cooldown memory headroom).
    """
    enc = MODEL_REGISTRY[model_name](
        patch_size=patch_size,
        img_size=(crop_size, crop_size),
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        uniform_power=uniform_power,
        use_rope=use_rope,
        use_silu=use_silu,
        wide_silu=wide_silu,
        use_activation_checkpointing=use_activation_checkpointing,
        remat_policy=remat_policy,
        use_flash=use_flash,
        cp_attend=cp_attend,
        dtype=dtype,
    )
    pred = VisionTransformerPredictor(
        img_size=(crop_size, crop_size),
        patch_size=patch_size,
        num_frames=num_frames,
        tubelet_size=tubelet_size,
        embed_dim=enc.embed_dim,
        predictor_embed_dim=pred_embed_dim,
        depth=pred_depth,
        num_heads=pred_num_heads or enc.num_heads,
        uniform_power=uniform_power,
        use_rope=use_rope,
        use_silu=use_silu,
        wide_silu=wide_silu,
        use_mask_tokens=use_mask_tokens,
        num_mask_tokens=num_mask_tokens,
        zero_init_mask_tokens=zero_init_mask_tokens,
        use_activation_checkpointing=use_activation_checkpointing,
        remat_policy=remat_policy,
        use_flash=use_flash,
        cp_attend=cp_attend,
        dtype=dtype,
    )
    return enc, pred


def init_params(encoder, predictor, seed: int, clip_shape, masks_enc0, masks_pred0):
    """Initialize encoder/predictor/target params (target = copy of encoder,
    reference deepcopy at `app/vjepa/train.py:210`)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    clips = jnp.zeros(clip_shape, jnp.float32)
    # jit the init/probe programs (eager op-by-op dispatch pays a round trip
    # per op on remote-tunnel platforms) — and pass every array as an
    # ARGUMENT: closure-captured device arrays get embedded in the lowered
    # program as constants, which blows up remote compiles (verify skill).
    enc_vars = jax.jit(lambda k, c, m: encoder.init(k, c, [m]))(k1, clips, masks_enc0)
    z = jax.jit(lambda v, c, m: encoder.apply(v, c, [m]))(enc_vars, clips, masks_enc0)
    pred_vars = jax.jit(
        lambda k, zz, me, mp: predictor.init(k, zz, me, mp, 0)
    )(k2, z, masks_enc0, masks_pred0)
    params = {"encoder": enc_vars["params"], "predictor": pred_vars["params"]}
    # Real copy (not aliased buffers): params and target are donated separately
    # by the train step, and XLA rejects donating the same buffer twice.
    target = jax.tree_util.tree_map(jnp.copy, enc_vars["params"])
    return params, target


def make_optimizer(hp: PretrainHParams, mask=None) -> optax.GradientTransformation:
    """``mask`` overrides the weight-decay mask (default: reference ndim>=2
    rule); the pipeline layout passes `core.pipeline.pp_wd_mask` because its
    stacked block leaves carry an extra layer axis."""
    lr_fn = functools.partial(
        warmup_cosine_lr,
        warmup_steps=hp.warmup_steps,
        start_lr=hp.start_lr,
        ref_lr=hp.lr,
        t_max=hp.total_steps,
        final_lr=hp.final_lr,
    )
    wd_fn = functools.partial(cosine_wd, ref_wd=hp.wd, t_max=hp.total_steps, final_wd=hp.final_wd)
    kw = {} if mask is None else {"mask": mask}
    return make_adamw(lr_fn, wd_fn, betas=hp.betas, eps=hp.eps, **kw)


def jepa_loss(z_list, h_list, loss_exp: float) -> jnp.ndarray:
    """Mean over (mask-config) pairs of mean |z - h|^p / p (reference
    `train.py:425-435`)."""
    loss = 0.0
    for z, h in zip(z_list, h_list):
        diff = jnp.abs(z.astype(jnp.float32) - h.astype(jnp.float32))
        if loss_exp != 1.0:
            diff = diff**loss_exp
        loss = loss + diff.mean() / loss_exp
    return loss / len(z_list)


def _device_normalize(clips, encoder, norm_stats):
    """uint8 clips -> normalized compute-dtype clips, ON DEVICE.

    The deferred-normalization pipeline (`VideoTransform(normalize_on_device)`)
    ships 1 byte/px over collate/IPC/H2D; the (x/255 - mean)/std runs here in
    fp32 and XLA fuses it into the patch-embed matmul prologue. Numerics match
    the host path (same fp32 formula, same final cast to the compute dtype)."""
    if clips.dtype != jnp.uint8:
        return clips
    assert norm_stats is not None, "uint8 clips need norm_stats=(mean, std)"
    mean = jnp.asarray(norm_stats[0], jnp.float32)
    std = jnp.asarray(norm_stats[1], jnp.float32)
    x = clips.astype(jnp.float32) * (1.0 / 255.0)
    dtype = getattr(encoder, "dtype", jnp.float32)
    return ((x - mean) / std).astype(dtype)


def make_train_step(encoder, predictor, tx, hp: PretrainHParams, mask_indices: Sequence[int] | None = None,
                    norm_stats=None, grad_accum: int = 1):
    """Build the jitted train step.

    batch: clips [B, T, H, W, C]; masks_enc/masks_pred: tuples (one per mask
    config) of [B, K] int32 index arrays (static K per config).
    norm_stats: (mean, std) for uint8 clips (deferred device normalization).

    ``grad_accum > 1``: inputs carry a leading microbatch dim ([A, B, ...] /
    [A, B, K]); a ``lax.scan`` runs A forward+backward passes (activations
    freed between them), averages the gradients, and applies ONE optimizer
    update — cooldown-scale effective batches on one chip, where the
    reference scales nodes instead (`cooldown-256px-64f.yaml:5-17`).
    """

    def loss_and_grads(params, target_params, clips, masks_enc, masks_pred):
        clips = _device_normalize(clips, encoder, norm_stats)

        # -- target features: full clip, stop-gradient, feature-wise layernorm
        h_all = encoder.apply({"params": target_params}, clips)
        h_all = h_all.astype(jnp.float32)
        h_all = (h_all - h_all.mean(-1, keepdims=True)) / jnp.sqrt(
            h_all.var(-1, keepdims=True) + 1e-6
        )
        h_all = jax.lax.stop_gradient(h_all)
        h_list = [apply_mask(h_all, mp) for mp in masks_pred]

        def loss_fn(params):
            z_list = []
            for i, (me, mp) in enumerate(zip(masks_enc, masks_pred)):
                z = encoder.apply({"params": params["encoder"]}, clips, [me])
                mask_index = mask_indices[i] if mask_indices is not None else i
                z = predictor.apply(
                    {"params": params["predictor"]}, z, me, mp, mask_index
                )
                z_list.append(z)
            return jepa_loss(z_list, h_list, hp.loss_exp)

        return jax.value_and_grad(loss_fn)(params)

    def train_step(state: TrainState, clips, masks_enc, masks_pred):
        momentum = ema_momentum(
            state.step, ema_start=hp.ema[0], ema_end=hp.ema[1], t_max=hp.total_steps
        )

        if grad_accum == 1:
            loss, grads = loss_and_grads(
                state.params, state.target_params, clips, masks_enc, masks_pred
            )
        else:
            from vjepa2_tpu.train.accum import scan_accumulate

            loss, grads = scan_accumulate(
                loss_and_grads, state.params, state.target_params,
                (clips, masks_enc, masks_pred), jnp.zeros((), jnp.float32),
                grad_accum,
            )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        target = ema_update(state.target_params, params["encoder"], momentum)
        new_state = state.replace(
            step=state.step + 1, params=params, target_params=target, opt_state=opt_state
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "ema_momentum": momentum,
        }
        return new_state, metrics

    return train_step


def make_multifpc_train_step(encoder, predictor, tx, hp: PretrainHParams,
                             num_mask_cfgs: int, norm_stats=None,
                             pp_mesh=None, pp_microbatches: int = 1,
                             pp_remat: bool = True,
                             pp_remat_policy: str | None = None):
    """Reference within-step multi-fpc semantics (`app/vjepa/train.py:425-435`,
    `src/masks/multiseq_multiblock3d.py:63-74`): ONE optimizer step averages
    the JEPA loss over every (fpc-bucket x mask-config) pair and applies ONE
    update. Under jit each bucket keeps its own static shapes, so the whole
    thing is still a single compiled program (the r2 design instead
    alternated one bucket per step, changing the gradient composition for
    genuinely multi-fpc configs — VERDICT r2 #4).

    Inputs: tuples over fpc buckets (ordered by the trainer's sorted fpcs) of
    clips [B_i, T_i, H, W, C] and per-mask-config index tuples. mask_index
    for bucket ``bi`` mask-config ``mi`` is ``bi * num_mask_cfgs + mi`` —
    identical to the per-bucket step dispatch.

    ``pp_mesh`` composes with pipeline parallelism: every bucket's encoder
    forwards (target + per-mask context) run the GPipe schedule over the
    mesh 'pipe' axis and the state uses the `core.pipeline.to_pp_params`
    layout (each bucket batch must be divisible by ``pp_microbatches``).
    """
    if pp_mesh is not None:
        from vjepa2_tpu.core.pipeline import make_pp_encode

        encode_pp = make_pp_encode(encoder, pp_mesh, pp_microbatches,
                                   remat=pp_remat,
                                   remat_policy=pp_remat_policy)

        def encode(enc_params, clips, masks=None):
            return encode_pp(enc_params["encoder"],
                             enc_params["encoder_blocks"], clips, masks)

        def enc_of(params):
            return {"encoder": params["encoder"],
                    "encoder_blocks": params["encoder_blocks"]}
    else:
        def encode(enc_params, clips, masks=None):
            return encoder.apply({"params": enc_params}, clips, masks)

        def enc_of(params):
            return params["encoder"]

    def train_step(state: TrainState, clips_tup, masks_enc_tup, masks_pred_tup):
        clips_tup = tuple(_device_normalize(c, encoder, norm_stats)
                          for c in clips_tup)
        momentum = ema_momentum(
            state.step, ema_start=hp.ema[0], ema_end=hp.ema[1], t_max=hp.total_steps
        )

        h_lists = []
        for clips, masks_pred in zip(clips_tup, masks_pred_tup):
            h_all = encode(state.target_params, clips)
            h_all = h_all.astype(jnp.float32)
            h_all = (h_all - h_all.mean(-1, keepdims=True)) / jnp.sqrt(
                h_all.var(-1, keepdims=True) + 1e-6
            )
            h_all = jax.lax.stop_gradient(h_all)
            h_lists.append([apply_mask(h_all, mp) for mp in masks_pred])

        def loss_fn(params):
            z_list, h_flat = [], []
            for bi, (clips, masks_enc, masks_pred) in enumerate(
                zip(clips_tup, masks_enc_tup, masks_pred_tup)
            ):
                for mi, (me, mp) in enumerate(zip(masks_enc, masks_pred)):
                    z = encode(enc_of(params), clips, [me])
                    z = predictor.apply(
                        {"params": params["predictor"]}, z, me, mp,
                        bi * num_mask_cfgs + mi,
                    )
                    z_list.append(z)
                    h_flat.append(h_lists[bi][mi])
            return jepa_loss(z_list, h_flat, hp.loss_exp)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        target = ema_update(state.target_params, enc_of(params), momentum)
        new_state = state.replace(
            step=state.step + 1, params=params, target_params=target, opt_state=opt_state
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "ema_momentum": momentum,
        }
        return new_state, metrics

    return train_step


def shard_state(state: TrainState, mesh, tp: bool = True, cp: bool = False) -> TrainState:
    """Place the train state on the mesh per the FSDP/TP param rules.

    ``tp=False, cp=True`` when the mesh 'model' axis is used for context
    parallelism (ring attention) rather than tensor parallelism: params are
    then ZeRO-sharded over the combined ('fsdp', 'model') axes — every ring
    rank applies identical params to its token shard, so the axis is
    data-parallel w.r.t. parameters and can carry param/opt-state shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(path, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return jax.device_put(
                leaf, NamedSharding(mesh, param_spec(path, leaf, tp=tp, cp=cp))
            )
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, state)


def jit_train_step(train_step, mesh, grad_accum: int = 1):
    """jit with batch sharded over (data, fsdp); state shardings propagate
    from the (already placed) input state. With ``grad_accum > 1`` the
    microbatch dim leads and the batch dim (sharded) is second."""
    from jax.sharding import NamedSharding

    from vjepa2_tpu.train.accum import microbatch_spec

    data_sh = NamedSharding(mesh, microbatch_spec(grad_accum))
    return jax.jit(
        train_step,
        in_shardings=(None, data_sh, data_sh, data_sh),
        donate_argnums=(0,),
    )
