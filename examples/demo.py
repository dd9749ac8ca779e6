"""Minimal inference demo (reference `notebooks/vjepa2_demo.py`).

Loads the hub encoder (+ converted weights if given), preprocesses a clip,
and prints feature stats; with an AC checkpoint also rolls the world model
one step.

Usage: python examples/demo.py [--checkpoint vitl.pt] [--tiny]
"""

import argparse
import sys

import numpy as np


def main():
    sys.path.insert(0, ".")
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vjepa2_tpu.data.video import synthetic_clip
    from vjepa2_tpu.hub import vjepa2_preprocessor, vjepa2_vit_large

    if args.tiny or args.checkpoint is None:
        from vjepa2_tpu.models.vision_transformer import vit_tiny

        enc = vit_tiny(img_size=(64, 64), num_frames=16, tubelet_size=2, use_rope=True)
        clip = vjepa2_preprocessor(crop_size=64)(synthetic_clip(16, 128, 160))
        params = jax.jit(enc.init)(jax.random.PRNGKey(0), jnp.asarray(clip)[None])["params"]
    else:
        (enc, params), _ = vjepa2_vit_large(checkpoint=args.checkpoint)
        clip = vjepa2_preprocessor(crop_size=256)(synthetic_clip(64, 288, 384))

    feats = enc.apply({"params": params}, jnp.asarray(clip)[None])
    print(f"clip {clip.shape} -> features {feats.shape}")
    print(f"feature stats: mean {float(feats.mean()):.4f} std {float(feats.std()):.4f}")


if __name__ == "__main__":
    main()
