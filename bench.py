"""Benchmark: ViT-g/16 clip-encode throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no wall-clock numbers (BASELINE.md), so
``vs_baseline`` reports model FLOPs utilization (measured / speed-of-light
on this chip) — the honest "how close to the hardware ceiling" number the
north star asks for. Flags: --model vit_large|vit_giant, --batch, --steps.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_TFLOPS = {
    # per-chip dense bf16 peak
    "TPU v5 lite": 394.0,  # v5e
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / trillium
    "cpu": 1.0,
}


def chip_peak_tflops() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for name, peak in PEAK_BF16_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return PEAK_BF16_TFLOPS.get(kind, 1.0)


def encode_flops(embed_dim, depth, mlp_ratio, n_tokens, patch_flop) -> float:
    """Analytic forward FLOPs per clip for a ViT encoder."""
    d = embed_dim
    per_block = (
        2 * n_tokens * d * 3 * d  # qkv
        + 4 * n_tokens * n_tokens * d  # qk^T + av
        + 2 * n_tokens * d * d  # proj
        + 2 * 2 * n_tokens * d * int(d * mlp_ratio)  # mlp fc1+fc2
    )
    return depth * per_block + patch_flop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_giant")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

    if args.model not in MODEL_REGISTRY:
        raise SystemExit(
            f"unknown model '{args.model}'; choose from: {', '.join(sorted(MODEL_REGISTRY))}"
        )
    enc = MODEL_REGISTRY[args.model](
        img_size=(args.size, args.size),
        num_frames=args.frames,
        tubelet_size=2,
        use_rope=True,
        uniform_power=True,
        dtype=jnp.bfloat16,
    )
    B, T, S = args.batch, args.frames, args.size
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), clips)

    # Chained steps: each input is perturbed by the previous output's mean,
    # so every dispatch has fresh args and a data dependency on the last —
    # immune to runtime-side memoization of identical (executable, args)
    # dispatches and to async-queue timing artifacts.
    @jax.jit
    def step(p, x, carry):
        out = enc.apply(p, x + carry)
        return out.astype(jnp.float32).mean() * 1e-30

    carry = step(params, clips, jnp.bfloat16(0.0))
    carry.block_until_ready()  # compile

    t0 = time.perf_counter()
    for _ in range(args.steps):
        carry = step(params, clips, carry.astype(jnp.bfloat16))
    carry.block_until_ready()
    dt = (time.perf_counter() - t0) / args.steps
    clips_per_sec = B / dt

    n_tokens = (T // 2) * (S // 16) ** 2
    d = enc.embed_dim
    patch_flop = 2 * n_tokens * d * (2 * 16 * 16 * 3)
    flops = encode_flops(d, enc.depth, enc.mlp_ratio, n_tokens, patch_flop)
    achieved_tflops = clips_per_sec * flops / 1e12
    mfu = achieved_tflops / chip_peak_tflops()

    print(
        json.dumps(
            {
                "metric": f"{args.model} encode clips/sec/chip ({T}f@{S}px bf16)",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
