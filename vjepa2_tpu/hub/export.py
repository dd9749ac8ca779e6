"""Serving export: AOT-serialized encoder forwards via `jax.export`.

The reference serves models through `torch.hub` (load-the-repo-and-run,
`hubconf.py`); the TPU-native deployment story is ahead-of-time export —
the jitted forward is traced once, serialized as portable StableHLO, and
the serving process deserializes + calls it with NO model code, flax, or
Python-side tracing in the loop. The artifact pins the calling convention,
is loadable across compatible jax versions, and can be compiled for any
backend available at load time (TPU serving pods, CPU canaries).

Symbolic batch: the batch dimension is exported symbolically so one
artifact serves every batch size (XLA still specializes per concrete size
at first call, then caches). Frames/resolution are baked in — V-JEPA
deployments fix the clip geometry per endpoint.

Format on disk (a directory):
    encode.stablehlo   — the serialized Exported (bytes)
    params.msgpack     — flax-serialized param tree
    meta.json          — clip geometry + dtype + model name

Usage:
    from vjepa2_tpu.hub import backbones, export
    enc, params, _ = backbones.vjepa2_vit_large()
    export.export_encoder(enc, params, "/srv/vjepa2-l", batch="B")

    # serving process (no vjepa2 model code needed):
    fn, meta = export.load_encoder("/srv/vjepa2-l")
    feats = fn(clips)   # [B, T, H, W, 3] -> [B, N, D]
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def export_encoder(encoder, params, out_dir: str, batch="B",
                   dtype: Optional[str] = None,
                   platforms: Optional[list] = None) -> str:
    """Serialize the encoder's jitted forward for serving.

    encoder: a `VisionTransformer` module; params: its param tree (or
    {"params": ...}); batch: an int for a fixed batch or a string (e.g.
    "B") for a symbolic batch dimension; platforms: lowering platforms
    (default: the current backend — pass ["tpu", "cpu"] to build one
    artifact servable on both).
    """
    if "params" not in params:
        params = {"params": params}
    T = encoder.num_frames
    H, W = encoder.img_size
    in_dtype = jnp.dtype(dtype or jnp.float32)

    def fwd(p, clips):
        return encoder.apply(p, clips)

    if isinstance(batch, str):
        (b,) = jexport.symbolic_shape(batch)
        clip_spec = jax.ShapeDtypeStruct((b, T, H, W, 3), in_dtype)
    else:
        clip_spec = jax.ShapeDtypeStruct((int(batch), T, H, W, 3), in_dtype)
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        params,
    )
    kwargs = {"platforms": platforms} if platforms else {}
    from vjepa2_tpu.ops.flash_attention import fwd_cap_override

    # serving is forward-only: trace with uncapped full-N flash blocks
    # (measured win, `ops/flash_attention.py:fwd_cap_override`)
    with fwd_cap_override(None):
        exported = jexport.export(jax.jit(fwd), **kwargs)(param_specs, clip_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "encode.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    from flax import serialization

    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    meta = {
        "num_frames": int(T), "img_size": [int(H), int(W)],
        "in_dtype": str(in_dtype), "batch": batch,
        "embed_dim": int(encoder.embed_dim),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_encoder(out_dir: str):
    """Deserialize an exported encoder; returns (callable, meta).

    The callable takes clips [B, T, H, W, 3] and returns features
    [B, N, D]. No model code or flax modules are imported on this path —
    only the serialized StableHLO and the param bytes."""
    from flax import serialization

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, "encode.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    # msgpack restores numpy arrays; move once to device for repeated calls
    params = jax.tree.map(jnp.asarray, params)

    def fn(clips):
        clips = jnp.asarray(clips, jnp.dtype(meta["in_dtype"]))
        return exported.call(params, clips)

    return fn, meta


def export_world_model(wm, out_dir: str,
                       platforms: Optional[list] = None) -> str:
    """Serialize a `planning.world_model.WorldModel` for serving.

    Two StableHLO programs cover the robot control loop (reference hot loop
    `notebooks/utils/mpc_utils.py:28-163`, which re-traces per call and
    round-trips pose math through scipy):

    * ``encode``: frame [H, W, 3] float32 -> latent tokens [N, D]
    * ``plan``:   (seed int32, rep [N, D], pose [7], goal [N, D])
                  -> planned actions [rollout, 7]

    The CEM's RNG rides as an int32 seed (the PRNGKey is built inside the
    exported program) so the serving side needs no jax key types. Encoder
    and predictor params serialize alongside; `load_world_model` needs no
    model code.
    """
    import jax.random as jrandom

    from vjepa2_tpu.hub.preprocessor import Preprocessor

    enc = wm.encoder
    H, W = enc.img_size
    N, D = wm.tokens_per_frame, enc.embed_dim

    # The host-side frame preprocessor (numpy resize/crop/normalize) cannot
    # ride the StableHLO program (data-dependent input shapes); record it in
    # meta so ServingWorldModel.encode re-applies it, and refuse arbitrary
    # callables we cannot reconstruct on the load side.
    if wm.preprocessor is None:
        pp_meta = None
    elif isinstance(wm.preprocessor, Preprocessor):
        pp_meta = {"kind": "vjepa2",
                   "crop_size": int(wm.preprocessor._t.crop_size)}
    else:
        raise ValueError(
            "export_world_model can only serialize the standard hub "
            "Preprocessor (or None); preprocess frames host-side and build "
            "the WorldModel with preprocessor=None instead")

    def encode_fn(enc_params, frame):
        return wm._encode_impl(enc_params, frame)

    def plan_fn(pred_params, seed, rep, pose, goal):
        return wm._cem(pred_params, jrandom.PRNGKey(seed), rep, pose, goal)

    f32 = jnp.float32
    enc_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        wm.enc_params)
    pred_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        wm.pred_params)
    kwargs = {"platforms": platforms} if platforms else {}
    from vjepa2_tpu.ops.flash_attention import fwd_cap_override

    # serving is forward-only: trace with uncapped full-N flash blocks
    with fwd_cap_override(None):
        enc_exp = jexport.export(jax.jit(encode_fn), **kwargs)(
            enc_specs, jax.ShapeDtypeStruct((H, W, 3), f32))
        plan_exp = jexport.export(jax.jit(plan_fn), **kwargs)(
            pred_specs, jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((N, D), f32), jax.ShapeDtypeStruct((7,), f32),
            jax.ShapeDtypeStruct((N, D), f32))

    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "encode.stablehlo"), "wb") as f:
        f.write(enc_exp.serialize())
    with open(os.path.join(out_dir, "plan.stablehlo"), "wb") as f:
        f.write(plan_exp.serialize())
    with open(os.path.join(out_dir, "enc_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(wm.enc_params))
    with open(os.path.join(out_dir, "pred_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(wm.pred_params))
    meta = {
        "img_size": [int(H), int(W)], "tokens_per_frame": int(N),
        "embed_dim": int(D), "normalize_reps": bool(wm.normalize_reps),
        "preprocessor": export_preprocessor_stats(),
        "frame_preprocessor": pp_meta,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ServingWorldModel:
    """Deserialized world model: `encode(frame)` + `plan(rep, pose, goal)`.

    No flax modules or tracing — just the two StableHLO programs, their
    param trees, and (when the source WorldModel had one) the numpy frame
    preprocessor reconstructed from meta.json."""

    def __init__(self, out_dir: str):
        from flax import serialization

        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        pp = self.meta.get("frame_preprocessor")
        self._preproc = None
        if pp is not None:
            from vjepa2_tpu.hub.preprocessor import vjepa2_preprocessor

            self._preproc = vjepa2_preprocessor(crop_size=pp["crop_size"])
        with open(os.path.join(out_dir, "encode.stablehlo"), "rb") as f:
            self._encode = jexport.deserialize(f.read())
        with open(os.path.join(out_dir, "plan.stablehlo"), "rb") as f:
            self._plan = jexport.deserialize(f.read())
        with open(os.path.join(out_dir, "enc_params.msgpack"), "rb") as f:
            self._enc_params = jax.tree.map(
                jnp.asarray, serialization.msgpack_restore(f.read()))
        with open(os.path.join(out_dir, "pred_params.msgpack"), "rb") as f:
            self._pred_params = jax.tree.map(
                jnp.asarray, serialization.msgpack_restore(f.read()))

    def encode(self, frame) -> jnp.ndarray:
        if self._preproc is not None:
            # mirror WorldModel.encode: preprocess the single frame as a
            # length-1 clip (resize/crop/normalize on host)
            frame = self._preproc(np.asarray(frame)[None])[0]
        return self._encode.call(self._enc_params,
                                 jnp.asarray(frame, jnp.float32))

    def plan(self, rep, pose, goal, seed: int = 0) -> np.ndarray:
        out = self._plan.call(
            self._pred_params, jnp.int32(seed), jnp.asarray(rep, jnp.float32),
            jnp.asarray(pose, jnp.float32), jnp.asarray(goal, jnp.float32))
        return np.asarray(out)


def load_world_model(out_dir: str) -> ServingWorldModel:
    return ServingWorldModel(out_dir)


def export_preprocessor_stats() -> dict:
    """Serving-side normalization constants (match `hub/preprocessor.py`)."""
    from vjepa2_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    return {"mean": np.asarray(IMAGENET_MEAN).tolist(),
            "std": np.asarray(IMAGENET_STD).tolist()}
