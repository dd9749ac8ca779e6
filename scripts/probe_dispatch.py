"""Trace-time dispatch audit of the bench pretrain step: which attention
calls ride the flash kernel vs the XLA fallback, with shapes and block
choices. All dispatch decisions are Python-level, so tracing (no TPU
compile) surfaces them. Run: python -u scripts/probe_dispatch.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.ops import attention as at
from vjepa2_tpu.ops import flash_attention as fa
from vjepa2_tpu.train.pretrain import (
    PretrainHParams, build_models, init_params, make_optimizer, make_train_step,
)
from vjepa2_tpu.train.state import TrainState

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]

_orig_core = fa._flash_attention_core
_orig_bhnd = fa.flash_attention_bhnd


def bhnd_logged(q, k, v, **kw):
    print(f"  flash_bhnd q={q.shape} kv_valid={kw.get('kv_valid_len')} "
          f"rope_expanded={kw.get('rope_expanded') is not None} "
          f"rope_tables={kw.get('rope_tables') is not None}", flush=True)
    return _orig_bhnd(q, k, v, **kw)


def core_logged(q, k, v, seg, qcos, qsin, kcos, ksin, *sa):
    (causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, block_h,
     interpret, kv_valid) = sa
    print(f"    core q={q.shape} blocks fwd=({block_q},{block_k}) "
          f"bwd=({bwd_block_q},{bwd_block_k}) kv_valid={kv_valid}", flush=True)
    return _orig_core(q, k, v, seg, qcos, qsin, kcos, ksin, *sa)


fa.flash_attention_bhnd = bhnd_logged
fa._flash_attention_core = core_logged

_orig_attend_bhnd = at.attend_bhnd


def attend_logged(q, k, v, **kw):
    out = _orig_attend_bhnd(q, k, v, **kw)
    return out


at.attend_bhnd = attend_logged

# also flag the XLA fallback: patch the softmax formulation marker
import vjepa2_tpu.models.modules as modules  # noqa: E402


def main():
    B, T, S = 8, 16, 256
    seed = int(os.environ.get("MASK_SEED", "0"))
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S), seed=seed) \
        if "seed" in MaskCollator.__init__.__code__.co_varnames else \
        MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    print("mask shapes enc:", [np.asarray(m).shape for m in me],
          "pred:", [np.asarray(m).shape for m in mp], flush=True)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    # trace-only: abstract init via eval_shape to skip real compute
    step = make_train_step(encoder, predictor, tx, hp)

    params, target = init_params(
        encoder, predictor, 0, (2, T, S, S, 3),
        jnp.asarray(np.asarray(me[0])[:2]), jnp.asarray(np.asarray(mp[0])[:2]),
    )
    state = TrainState.create(params, target, tx)
    clips = jnp.zeros((B, T, S, S, 3), jnp.bfloat16)
    mej = tuple(jnp.asarray(m) for m in me)
    mpj = tuple(jnp.asarray(m) for m in mp)
    print("tracing step...", flush=True)
    lowered = jax.jit(step).lower(state, clips, mej, mpj)
    print("traced ok", flush=True)
    txt = lowered.as_text()
    n_custom = txt.count("tpu_custom_call") + txt.count("mosaic")
    print("custom-call mentions in HLO:", n_custom)


if __name__ == "__main__":
    main()
