"""Second half of the pretrain dispatch attribution (VERDICT r5 #4).

`probe_dispatch_pretrain.py` cleared the INPUT side: flattening the full
1625-leaf TrainState costs 1.33 ms/dispatch, not the observed 9-15 ms.
The remaining suspect is the OUTPUT side — the train step returns a new
TrainState (~1625 device buffers) + metrics, and the tunnel client builds
a handle/future per output; the encode program (one output) dispatches in
0.3-1.2 ms. This probe times jitted identities with increasing output
counts on the same tree, plus a donated variant, to put a per-output
price on dispatch.

Run: timeout 2400 python -u scripts/probe_dispatch_outputs.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.pretrain import (
    PretrainHParams, build_models, init_params, make_optimizer,
)
from vjepa2_tpu.train.state import TrainState

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]


def _dispatch_ms(fn, *args, n=20):
    ts = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        ts.append(time.perf_counter() - t0)
        jax.block_until_ready(out)
    ts = sorted(ts)[2:-2]
    return 1e3 * sum(ts) / len(ts), out


def main():
    B, T, S = 8, 16, 256
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T, pred_depth=12,
        pred_embed_dim=384, pred_num_heads=12, use_rope=True,
        num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16)
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]),
        jnp.asarray(mp[0]))
    state = TrainState.create(params, target, tx)
    n_leaves = len(jax.tree.leaves(state))
    print(f"TrainState leaves: {n_leaves}", flush=True)

    # identity returning the FULL tree (so every leaf is an output buffer)
    @jax.jit
    def ident_full(s):
        return jax.tree.map(lambda x: x + 0 if jnp.issubdtype(x.dtype, jnp.floating) else x, s)

    # identity returning one scalar derived from the tree
    @jax.jit
    def ident_scalar(s):
        return s.step + 0

    # donated full-tree identity (the real step's signature shape)
    ident_don = jax.jit(
        lambda s: jax.tree.map(
            lambda x: x + 0 if jnp.issubdtype(x.dtype, jnp.floating) else x, s),
        donate_argnums=(0,))

    ms, _ = _dispatch_ms(ident_scalar, state)
    print(f"dispatch scalar-out:      {ms:6.2f} ms", flush=True)
    ms, _ = _dispatch_ms(ident_full, state)
    print(f"dispatch full-tree-out:   {ms:6.2f} ms ({n_leaves} outputs)",
          flush=True)
    # donated: state must be rebuilt per call — chain it
    ts = []
    s = state
    for _ in range(20):
        t0 = time.perf_counter()
        s = ident_don(s)
        ts.append(time.perf_counter() - t0)
        jax.block_until_ready(jax.tree.leaves(s)[0])
    ts = sorted(ts)[2:-2]
    print(f"dispatch donated-full:    {1e3 * sum(ts) / len(ts):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
