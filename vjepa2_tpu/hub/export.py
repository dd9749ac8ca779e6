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


def export_preprocessor_stats() -> dict:
    """Serving-side normalization constants (match `hub/preprocessor.py`)."""
    from vjepa2_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    return {"mean": np.asarray(IMAGENET_MEAN).tolist(),
            "std": np.asarray(IMAGENET_STD).tolist()}
