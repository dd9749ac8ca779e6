"""vjepa2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) V-JEPA 2 framework.

A ground-up re-design of the capabilities of the reference V-JEPA 2 repo
(weipeilun/vjepa2) for TPU hardware:

* models: video ViT encoder (sincos / 3D-RoPE), JEPA predictor,
  action-conditioned predictor, attentive probes (flax.linen).
* ops: fused TPU paths — RoPE with explicit per-token position ids,
  XLA/Pallas attention, gather-based token masking.
* masks: host-side multi-block 3D mask sampling with static shapes.
* train: single jitted train step (dual encoder fwd + predictor + L1 +
  AdamW + EMA) sharded over a ('data','fsdp','model') device mesh.
* evals: frozen-feature attentive probes (probe grids vmapped on device).
* hub: public model factories + torch-checkpoint converter.
* planning: jit-compiled CEM/MPC over the latent world model.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

if _os.environ.get("VJEPA2_TPU_PRNG", "rbg") == "rbg":
    # The default threefry PRNG compiles pathologically slowly on TPU for
    # whole-model init programs (~35x slower than rbg measured on v5e: 350s
    # vs 10s for a 12-block ViT init). rbg is the TPU-native generator;
    # seeds still give reproducible runs. Opt out: VJEPA2_TPU_PRNG=threefry.
    _jax.config.update("jax_default_prng_impl", "rbg")

_cache_dir = _os.environ.get("VJEPA2_TPU_COMPILE_CACHE", _os.path.expanduser("~/.jax_cache"))
if _cache_dir and _cache_dir != "off":
    # Persistent compilation cache: big-program compiles through remote
    # device tunnels take minutes; cache them across processes.
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
