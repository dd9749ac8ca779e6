"""GPipe-style pipeline parallelism over the mesh 'pipe' axis.

The reference scales V-JEPA by DDP over NCCL only (SURVEY.md §2.6,
`src/utils/distributed.py`); this module adds the parallelism family DDP
cannot express: the encoder's transformer blocks are split into P
contiguous stages, each stage living on a different slice of the device
mesh, and microbatches stream through the stages. On multi-slice TPU pods
this is the canonical DCN-friendly layout — within a stage, fsdp
collectives ride ICI; between stages only the point-to-point boundary
activation crosses DCN (`make_mesh` orders 'pipe' slowest for exactly
this reason).

Design (TPU-first, no torch pipeline-engine analogue):

* Block params are STACKED along a leading layer axis ([depth, ...] per
  leaf) and sharded over 'pipe' — each device materializes only its own
  depth/P layers (composing with ZeRO over 'fsdp' on the next-largest
  dim, `stage_param_spec`).
* The schedule is a `jax.shard_map` manual only over 'pipe' (GSPMD keeps
  handling 'data'/'fsdp' inside): a `lax.scan` over M + P - 1 iterations
  where each device applies its stage to its current microbatch and
  `ppermute`s the boundary activation to the next stage. The first P - 1
  iterations per stage are the usual GPipe bubble (computed on garbage,
  discarded by a `where` write mask — static shapes, no divergence).
* Backward needs no code: AD reverses the scan and transposes ppermute
  to the opposite rotation, which IS the reverse pipeline schedule.
  `jax.checkpoint` around the stage keeps only boundary activations
  live (M x [mb, N, D] per stage), the GPipe memory profile.
* Per-microbatch aux (RoPE tables / position ids built from the mask
  indices) is not sent around the ring: every stage indexes the aux of
  the microbatch it is currently processing (iteration t, stage s works
  on microbatch t - s) — one dynamic_index instead of P hops.

Outputs leave stacked over 'pipe' and the last stage's slice is taken
outside the manual region (the other slices are dead code), so GSPMD
broadcasts one shard point-to-point; downstream (predictor, loss) runs
under plain GSPMD, replicated over the pipe axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_PREFIX = "blocks_"


# ---------------------------------------------------------------- params

def split_block_params(enc_params: dict):
    """Encoder param dict -> (rest, stacked).

    ``rest`` keeps every non-block entry (patch_embed, norm, ...);
    ``stacked`` is one pytree whose leaves carry a leading [depth] layer
    axis — the representation the pipeline shards over 'pipe'.
    """
    depth = sum(1 for k in enc_params if k.startswith(BLOCK_PREFIX))
    assert depth > 0, f"no '{BLOCK_PREFIX}*' entries in {list(enc_params)}"
    rest = {k: v for k, v in enc_params.items() if not k.startswith(BLOCK_PREFIX)}
    blocks = [enc_params[f"{BLOCK_PREFIX}{i}"] for i in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return rest, stacked


def merge_block_params(rest: dict, stacked) -> dict:
    """Inverse of `split_block_params` (checkpoint/converter interop)."""
    depth = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
    out = dict(rest)
    for i in range(depth):
        out[f"{BLOCK_PREFIX}{i}"] = jax.tree_util.tree_map(lambda a: a[i], stacked)
    return out


def stage_param_spec(leaf, name: str = "", tp: bool = False) -> P:
    """Sharding for a stacked-block leaf: layer axis over 'pipe', ZeRO over
    'fsdp' on the largest remaining dim of matrices (a stacked 2-D kernel is
    3-D; stacked biases/scales are 2-D and stay pipe-sharded only).

    ``tp=True`` adds Megatron-style tensor parallelism over 'model' INSIDE
    each stage (the schedule is manual only over 'pipe'; GSPMD keeps
    auto-sharding the other axes within the shard_map region): stacked
    column-parallel kernels (qkv / mlp-in) put 'model' on the output dim,
    row-parallel (attn-proj / mlp-out) on the input dim — same rules as
    `core.mesh.param_spec` shifted one dim for the layer axis.
    """
    if leaf.ndim < 3:
        return P("pipe")
    if tp and leaf.ndim == 3:
        _, d_in, d_out = leaf.shape
        is_qkv = "qkv/kernel" in name or name.endswith("kv/kernel")
        col_parallel = is_qkv or ("mlp/fc1" in name) or (d_out > d_in and "mlp" in name)
        row_parallel = ("attn/proj" in name) or ("mlp/fc3" in name) or (
            "mlp/fc2" in name and d_out < d_in
        )
        if col_parallel:
            return P("pipe", "fsdp", "model")
        if row_parallel:
            return P("pipe", "model", "fsdp")
    axis = 1 + int(np.argmax(leaf.shape[1:]))
    spec: list = [None] * leaf.ndim
    spec[0] = "pipe"
    spec[axis] = "fsdp"
    return P(*spec)


# -------------------------------------------------------------- schedule

def pipeline_blocks(block_apply, stacked, tokens, aux_mb, aux_bc, *,
                    mesh: Mesh, n_microbatch: int, remat: bool = True,
                    remat_policy: str | None = None):
    """Run the stacked block stack over ``tokens`` with the GPipe schedule.

    block_apply(block_params, tok, aux) -> tok, where ``aux`` merges the
    per-microbatch dict (leaves with a leading batch dim, microbatched here)
    and the broadcast dict. P == mesh.shape['pipe'] must divide the stacked
    depth; n_microbatch must divide the batch.
    """
    n_pipe = mesh.shape["pipe"]
    depth = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
    assert depth % n_pipe == 0, f"depth {depth} not divisible by pipe={n_pipe}"

    def stage_fn(stg, tok, aux_t, bc):
        def layer(t, p):
            return block_apply(p, t, {**bc, **aux_t}), None

        tok, _ = jax.lax.scan(layer, tok, stg)
        return tok

    if remat:
        from vjepa2_tpu.models.modules import resolve_remat_policy

        stage_fn = jax.checkpoint(
            stage_fn, policy=resolve_remat_policy(remat_policy))

    if n_pipe == 1:
        # degenerate pipeline: one stage, no schedule, no collectives
        return stage_fn(stacked, tokens, aux_mb, aux_bc)

    b_eff = tokens.shape[0]
    m = n_microbatch
    assert b_eff % m == 0, f"batch {b_eff} not divisible by microbatches {m}"
    tok_mb = tokens.reshape(m, b_eff // m, *tokens.shape[1:])
    aux_mb = jax.tree_util.tree_map(
        lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:]), aux_mb)

    # everything the stages touch rides in as an explicit shard_map operand
    # (closed-over tracers inside a manual region are fragile across jax
    # versions); aux_bc is replicated over 'pipe', aux_mb microbatched.
    def _local(stacked_l, tok_mb, aux_mb, aux_bc):
        # stacked_l: this stage's [depth/P, ...] slice (shard_map manual axis)
        idx = jax.lax.axis_index("pipe")

        def body(carry, t):
            recv, outputs = carry
            j = jnp.clip(t - idx, 0, m - 1)  # microbatch this stage works on
            tok_in = jax.lax.dynamic_index_in_dim(tok_mb, j, 0, keepdims=False)
            aux_t = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, j, 0, keepdims=False),
                aux_mb,
            )
            inp = jnp.where(idx == 0, tok_in, recv)
            out = stage_fn(stacked_l, inp, aux_t, aux_bc)
            # last stage banks microbatch t-(P-1); bubble results are dropped
            jw = jnp.clip(t - (n_pipe - 1), 0, m - 1)
            write = (idx == n_pipe - 1) & (t >= n_pipe - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, jw, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, out, cur), jw, 0)
            recv = jax.lax.ppermute(
                out, "pipe", [(i, (i + 1) % n_pipe) for i in range(n_pipe)])
            return (recv, outputs), None

        init = (jnp.zeros_like(tok_mb[0]), jnp.zeros_like(tok_mb))
        (_, outputs), _ = jax.lax.scan(body, init, jnp.arange(m + n_pipe - 1))
        return outputs[None]  # stack over 'pipe'; only the last slice is live

    out = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("pipe"), P(), P(), P()),
        out_specs=P("pipe"),
        axis_names={"pipe"},
        check_vma=False,
    )(stacked, tok_mb, aux_mb, aux_bc)
    # Take the last stage's banked outputs; the other stages' slices are
    # dead, so GSPMD broadcasts ONE shard point-to-point instead of
    # all-reducing the full [M, ...] tensor over the pipe axis (a psum here
    # would double cross-slice traffic on multi-slice pods and its AD
    # transpose would re-broadcast cotangents in backward).
    out = out[n_pipe - 1]
    return out.reshape(b_eff, *out.shape[2:])


# -------------------------------------------------------------- encoder

def make_pp_encode(encoder, mesh: Mesh, n_microbatch: int, remat: bool = True,
                   remat_policy: str | None = None):
    """Pipelined forward for a `VisionTransformer`.

    Returns ``encode(rest, stacked, clips, masks=None) -> tokens`` that is
    numerically identical to ``encoder.apply`` (same pre/post code via the
    module's ``stage='pre'`` path and a standalone final LayerNorm; the block
    stack runs the GPipe schedule above). Differentiable end to end.
    """
    from vjepa2_tpu.models.modules import Block, LayerNorm

    assert encoder.cp_attend is None, "pipeline does not compose with the CP ring"
    assert encoder.out_layers is None, "pipeline mode has no out_layers taps"

    def encode(rest, stacked, clips, masks=None):
        tokens, aux = encoder.apply({"params": rest}, clips, masks, stage="pre")
        blk = Block(
            dim=encoder.embed_dim,
            num_heads=encoder.num_heads,
            mlp_ratio=encoder.mlp_ratio,
            qkv_bias=encoder.qkv_bias,
            use_rope=encoder.use_rope,
            use_silu=encoder.use_silu,
            wide_silu=encoder.wide_silu,
            use_flash=encoder.use_flash,
            dtype=encoder.dtype,
            init_std=encoder.init_std,
            head_perm=aux["head_perm"],
            kv_valid=aux["kv_valid"],
        )
        h_p, w_p = aux["h_patches"], aux["w_patches"]

        def block_apply(p, tok, a):
            return blk.apply(
                {"params": p}, tok, a["pos_ids"], None, h_p, w_p, True,
                a["rope_cache"], a["rope_expanded"],
            )

        # With masks, pos_ids/RoPE tables are per-sample (mask-dependent
        # gathers) and must be microbatched alongside the tokens; without,
        # they are shared position tables and broadcast to every stage.
        # (Deciding by shape would misfire when N happens to equal B.)
        batched = masks is not None
        aux_mb, aux_bc = {}, {}
        for key in ("pos_ids", "rope_cache", "rope_expanded"):
            val = aux[key]
            if batched and jax.tree_util.tree_leaves(val):
                aux_mb[key] = val
            else:
                aux_bc[key] = val

        out = pipeline_blocks(
            block_apply, stacked, tokens, aux_mb, aux_bc,
            mesh=mesh, n_microbatch=n_microbatch, remat=remat,
            remat_policy=remat_policy,
        )
        norm = LayerNorm(dtype=encoder.dtype)
        return norm.apply({"params": rest["norm"]}, out[:, : aux["n_real"]])

    return encode


# ------------------------------------------------------------ train step

def to_pp_params(params: dict, target):
    """{encoder, predictor} params + target tree -> pipeline layout.

    Block params stack into 'encoder_blocks'; everything else keeps its
    place. The inverse (for checkpoints / the torch converter) is
    `from_pp_params`.
    """
    rest, stacked = split_block_params(params["encoder"])
    t_rest, t_stacked = split_block_params(target)
    pp_params = {"encoder": rest, "encoder_blocks": stacked,
                 "predictor": params["predictor"]}
    pp_target = {"encoder": t_rest, "encoder_blocks": t_stacked}
    return pp_params, pp_target


def from_pp_params(pp_params: dict, pp_target):
    params = {
        "encoder": merge_block_params(pp_params["encoder"],
                                      pp_params["encoder_blocks"]),
        "predictor": pp_params["predictor"],
    }
    target = merge_block_params(pp_target["encoder"], pp_target["encoder_blocks"])
    return params, target


def pp_wd_mask(params):
    """Weight-decay mask for the pipeline param layout: stacked block leaves
    carry an extra layer axis, so the reference's "ndim >= 2, non-bias" rule
    (`app/vjepa/utils.py:207-255`) becomes ndim >= 3 under 'encoder_blocks'."""

    def mask(path, p):
        in_blocks = any(
            getattr(k, "key", getattr(k, "name", None)) == "encoder_blocks"
            for k in path
        )
        return p.ndim >= (3 if in_blocks else 2)

    return jax.tree_util.tree_map_with_path(mask, params)


def shard_pp_state(state, mesh: Mesh):
    """Place a pipeline-layout TrainState: stacked blocks over
    ('pipe', 'fsdp'), everything else per the usual FSDP rules, scalars
    replicated. Mirrors `train.pretrain.shard_state`."""
    from vjepa2_tpu.core.mesh import param_spec

    tp = mesh.shape["model"] > 1

    def place(path, leaf):
        pstr = "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in path)
        if "encoder_blocks" in pstr and getattr(leaf, "ndim", 0) >= 1:
            return jax.device_put(
                leaf, NamedSharding(mesh, stage_param_spec(leaf, pstr, tp=tp)))
        if getattr(leaf, "ndim", 0) >= 2:
            return jax.device_put(
                leaf, NamedSharding(mesh, param_spec(path, leaf, tp=tp)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, state)


def make_pp_train_step(encoder, predictor, tx, hp, mesh: Mesh,
                       n_microbatch: int, mask_indices=None, norm_stats=None,
                       remat: bool = True, remat_policy: str | None = None,
                       grad_accum: int = 1):
    """Pipeline-parallel variant of `train.pretrain.make_train_step`.

    Both encoder forwards (EMA target + per-mask context) run the GPipe
    schedule; the predictor and loss stay under plain GSPMD (replicated over
    'pipe' — the predictor is ~5% of step FLOPs at ViT-g scale, and its
    gradients are identical on every pipe rank, so no extra collectives
    appear). State uses the `to_pp_params` layout.

    ``grad_accum > 1`` composes with the schedule: each accumulation
    microbatch (leading [A] dim on the inputs) runs the full GPipe pass —
    pipe microbatching happens *inside* each accumulation step, so the
    effective per-pass batch must still be divisible by `n_microbatch` —
    and the averaged gradients get ONE optimizer update (`train.accum`).
    """
    import optax

    from vjepa2_tpu.core.optim import ema_update
    from vjepa2_tpu.core.schedulers import ema_momentum
    from vjepa2_tpu.ops.masking import apply_mask
    from vjepa2_tpu.train.pretrain import _device_normalize, jepa_loss

    encode = make_pp_encode(encoder, mesh, n_microbatch, remat=remat,
                            remat_policy=remat_policy)

    def loss_and_grads(params, target_params, clips, masks_enc, masks_pred):
        clips_n = _device_normalize(clips, encoder, norm_stats)

        h_all = encode(target_params["encoder"],
                       target_params["encoder_blocks"], clips_n)
        h_all = h_all.astype(jnp.float32)
        h_all = (h_all - h_all.mean(-1, keepdims=True)) / jnp.sqrt(
            h_all.var(-1, keepdims=True) + 1e-6)
        h_all = jax.lax.stop_gradient(h_all)
        h_list = [apply_mask(h_all, mp) for mp in masks_pred]

        def loss_fn(params):
            z_list = []
            for i, (me, mp) in enumerate(zip(masks_enc, masks_pred)):
                z = encode(params["encoder"], params["encoder_blocks"],
                           clips_n, [me])
                mask_index = mask_indices[i] if mask_indices is not None else i
                z = predictor.apply(
                    {"params": params["predictor"]}, z, me, mp, mask_index)
                z_list.append(z)
            return jepa_loss(z_list, h_list, hp.loss_exp)

        return jax.value_and_grad(loss_fn)(params)

    def train_step(state, clips, masks_enc, masks_pred):
        momentum = ema_momentum(
            state.step, ema_start=hp.ema[0], ema_end=hp.ema[1],
            t_max=hp.total_steps)

        if grad_accum == 1:
            loss, grads = loss_and_grads(
                state.params, state.target_params, clips, masks_enc, masks_pred)
        else:
            from vjepa2_tpu.train.accum import scan_accumulate

            loss, grads = scan_accumulate(
                loss_and_grads, state.params, state.target_params,
                (clips, masks_enc, masks_pred), jnp.zeros((), jnp.float32),
                grad_accum,
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        target = ema_update(
            state.target_params,
            {"encoder": params["encoder"],
             "encoder_blocks": params["encoder_blocks"]},
            momentum,
        )
        new_state = state.replace(
            step=state.step + 1, params=params, target_params=target,
            opt_state=opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "ema_momentum": momentum,
        }
        return new_state, metrics

    return train_step
