"""Benchmarks on the local accelerator. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Modes:
  --mode headline  (default) measured matmul ceiling + ViT-g encode (the
                   BASELINE.json "clips/sec/chip") + ViT-L masked-pretrain
                   step, each timed as THREE independent runs (after a
                   warmup step) with per-step dispatch times; the headline
                   is the MEDIAN run — auditable and self-checking.
  --mode encode    encode throughput only
  --mode pretrain  full masked-pretrain train-step time (dual encoder fwd +
                   predictor + backward + AdamW + EMA)
  --mode ac / cem  AC train step / CEM planning latency

``vs_baseline`` is MFU against the MEASURED bf16 matmul ceiling of this
device/stack (the dev tunnel delivers ~120 of the chip's 394 nominal
TFLOPS; judging the model against the spec sheet would misattribute
platform loss). The nominal-peak MFU is also reported in ``extra``.

NOTE (hard-won, .claude/skills/verify/SKILL.md):
* timing must chain a data dependency between steps — the device runtime
  memoizes repeated identical (executable, args) dispatches;
* ``block_until_ready`` can return without executing on tunnel platforms —
  only a value fetch forces execution;
* tunnel throughput varies across sessions (BENCH_r01 recorded 2.21 clips/s
  for a program that measures 13.7 on healthy sessions) — hence three runs,
  a median headline, and the agreement field: if ``extra.agreement`` is far
  from 1.0, the session/platform was unstable, not the model.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# The driver environment registers the TPU backend from sitecustomize, which
# WINS over the JAX_PLATFORMS env var (see tests/conftest.py). Re-apply the
# env var through jax.config so `JAX_PLATFORMS=cpu python bench.py ...`
# actually runs on CPU (smoke tests on hosts where the tunnel is down).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

PEAK_BF16_TFLOPS = {
    # per-chip dense bf16 peak
    "TPU v5 lite": 197.0,  # v5e (394 is the int8 TOPS figure, bf16 is 197)
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / trillium
    "cpu": 1.0,
}

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]


def chip_peak_tflops() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for name, peak in PEAK_BF16_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return PEAK_BF16_TFLOPS.get(kind, 1.0)


_PEAK_CACHE: list = []


def measured_peak_tflops(n: int = 8192, iters: int = 64, reps: int = 2) -> float:
    """Empirical bf16 matmul ceiling on THIS device/stack.

    The matmul chain runs inside ONE jitted fori_loop per dispatch, so a
    contended host CPU (concurrent test runs, data workers) cannot starve
    the device and fake a low ceiling — per-step Python dispatch did exactly
    that in BENCH-headline shakeout (29 "TFLOPS" with pytest running).

    ``iters`` is sized so total device work (~720 ms) dwarfs the ~35 ms
    fixed dispatch+fetch round-trip the tunnel charges per timing window
    (micro-bench methodology v4, .claude/skills/verify/SKILL.md) — at the
    old iters=16 the overhead shaved ~20% off the reading (150 vs the
    ~190-200 this chip measures with the overhead amortized).
    """
    if _PEAK_CACHE:
        return _PEAK_CACHE[0]
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n, n), jnp.bfloat16)
    b = jax.random.normal(k, (n, n), jnp.bfloat16)

    @jax.jit
    def chain(x, y):
        return jax.lax.fori_loop(0, iters, lambda i, v: (v @ y) * 1e-4, x)

    x = chain(a, b)
    float(x[0, 0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        x = chain(x, b)
    float(x[0, 0])
    dt = (time.perf_counter() - t0) / (iters * reps)
    peak = 2 * n**3 / dt / 1e12
    _PEAK_CACHE.append(peak)
    return peak


def encoder_flops(embed_dim, depth, mlp_ratio, n_tokens, patch_size=16, tubelet=2) -> float:
    """Analytic forward FLOPs for one sample of a ViT encoder."""
    d = embed_dim
    per_block = (
        2 * n_tokens * d * 3 * d  # qkv
        + 4 * n_tokens * n_tokens * d  # qk^T + av
        + 2 * n_tokens * d * d  # proj
        + 2 * 2 * n_tokens * d * int(d * mlp_ratio)  # mlp fc1+fc2
    )
    patch_flop = 2 * n_tokens * d * (tubelet * patch_size * patch_size * 3)
    return depth * per_block + patch_flop


def _timed_runs(step, n_steps: int, n_runs: int = 3, warmup_steps: int = 1):
    """Chained-carry timing, ``n_runs`` independent windows.

    ``step`` maps a scalar carry to a new scalar carry (with all the real
    work data-dependent on it). Returns list of run dicts.

    ``warmup_steps`` post-compile steps run (and block) before the first
    timed window: the first dispatch after compilation pays a one-time
    donation/layout shuffle (891 ms observed on a 540 ms step in the r2
    driver capture) that is warmup, not the program.
    """
    runs = []
    carry = jnp.float32(0.0)
    for _ in range(warmup_steps):
        carry = step(carry) * 1e-30
        float(carry)
    for r in range(n_runs):
        per_step = []
        t0 = time.perf_counter()
        for _ in range(n_steps):
            ts = time.perf_counter()
            carry = step(carry)
            per_step.append(round((time.perf_counter() - ts) * 1e3, 2))
        float(carry)
        dt = (time.perf_counter() - t0) / n_steps
        runs.append({"ms_per_step": round(dt * 1e3, 2),
                     "dispatch_ms": per_step})
        carry = carry * 1e-30
    return runs


def _agreement(runs) -> float:
    times = [r["ms_per_step"] for r in runs]
    return round(min(times) / max(times), 4)


def _median_ms(runs) -> float:
    """Median-of-runs headline (r3, VERDICT #7): robust to one contended
    window, unlike min (flatters) or mean (penalizes platform noise)."""
    times = sorted(r["ms_per_step"] for r in runs)
    n = len(times)
    mid = times[n // 2] if n % 2 else (times[n // 2 - 1] + times[n // 2]) / 2
    return round(mid, 2)


def bench_encode(args, n_runs: int = 3):
    from vjepa2_tpu.ops.flash_attention import fwd_cap_override

    # Encode-only programs take uncapped full-N fwd k blocks: measured win
    # (r4s2 `scripts/probe_encode_caps.py`: 361.1 vs 369.7 ms/step, ViT-g
    # 16f@256 bs8) and none of the train program's scoped-VMEM pressure.
    # The cap is restored before any train-step tracing (pretrain keeps
    # (1024, 1024) — the full-N train variant rides the 16 MB cliff
    # program-dependently, r4s1 bisect).
    with fwd_cap_override(None):
        return _bench_encode_inner(args, n_runs)


def _bench_encode_inner(args, n_runs: int = 3):
    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

    enc = MODEL_REGISTRY[args.model](
        img_size=(args.size, args.size),
        num_frames=args.frames,
        tubelet_size=2,
        use_rope=True,
        uniform_power=True,
        use_flash=not args.no_flash,  # supports() falls back off-TPU
        dtype=jnp.bfloat16,
    )
    B, T, S = args.batch, args.frames, args.size
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    t0 = time.perf_counter()
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), clips)
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0

    @jax.jit
    def fwd(p, x, carry):
        out = enc.apply(p, x + carry)
        return out.astype(jnp.float32).mean() * 1e-30

    t0 = time.perf_counter()
    float(fwd(params, clips, jnp.bfloat16(0.0)))
    compile_s = time.perf_counter() - t0

    runs = _timed_runs(lambda c: fwd(params, clips, c.astype(jnp.bfloat16)), args.steps, n_runs)
    best_ms = _median_ms(runs)
    clips_per_sec = B / (best_ms / 1e3)

    n_tokens = (T // 2) * (S // 16) ** 2
    flops = encoder_flops(enc.embed_dim, enc.depth, enc.mlp_ratio, n_tokens)
    measured = measured_peak_tflops()
    mfu = clips_per_sec * flops / 1e12 / measured
    return {
        "metric": f"{args.model} encode clips/sec/chip ({T}f@{S}px bf16)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(mfu, 4),
        "extra": {
            "measured_peak_tflops": round(measured, 1),
            "nominal_peak_tflops": chip_peak_tflops(),
            "mfu_vs_nominal": round(clips_per_sec * flops / 1e12 / chip_peak_tflops(), 4),
            "flops_per_clip_T": round(flops / 1e12, 3),
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "runs": runs,
            "agreement": _agreement(runs),
        },
    }


def bench_pretrain(args, n_runs: int = 3):
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams,
        build_models,
        init_params,
        make_optimizer,
        make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    B, T, S = args.batch, args.frames, args.size
    encoder, predictor = build_models(
        model_name=args.model,
        crop_size=S,
        num_frames=T,
        pred_depth=12,
        pred_embed_dim=384,
        pred_num_heads=12,
        use_rope=True,
        num_mask_tokens=2,
        use_activation_checkpointing=args.remat,
        remat_policy=getattr(args, "remat_policy", None),
        use_flash=not args.no_flash,
        dtype=jnp.bfloat16,
    )
    A = max(1, getattr(args, "accum", 1))
    assert B % A == 0, f"batch {B} not divisible by --accum {A}"

    def _shape(clips, menc, mpred):
        # grad accumulation: microbatch dim leads ([A, B/A, ...])
        if A == 1:
            return clips, tuple(map(jnp.asarray, menc)), tuple(map(jnp.asarray, mpred))
        b = B // A
        return (
            clips.reshape(A, b, *clips.shape[1:]),
            tuple(jnp.asarray(m).reshape(A, b, -1) for m in menc),
            tuple(jnp.asarray(m).reshape(A, b, -1) for m in mpred),
        )

    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    masks_enc, masks_pred = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    t0 = time.perf_counter()
    params, target = init_params(
        encoder, predictor, 0, (B // A, T, S, S, 3),
        jnp.asarray(masks_enc[0][: B // A]), jnp.asarray(masks_pred[0][: B // A]),
    )
    init_s = time.perf_counter() - t0
    state = TrainState.create(params, target, tx)
    step = jax.jit(make_train_step(encoder, predictor, tx, hp, grad_accum=A),
                   donate_argnums=(0,))

    rs = np.random.RandomState(0)
    # bf16 clips: what the train loop actually feeds (host casts on collate)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    c0, me, mp = _shape(clips, masks_enc, masks_pred)

    t0 = time.perf_counter()
    state, metrics = step(state, c0, me, mp)  # compile
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    box = [state]

    def one(carry):
        # fresh masks each step = fresh args (defeats dispatch memoization);
        # the loss carried out chains the data dependency
        coll.step()
        menc, mpred = coll(T, B)
        ci, mei, mpi = _shape(clips + carry.astype(jnp.bfloat16) * 0, menc, mpred)
        box[0], m = step(box[0], ci, mei, mpi)
        return m["loss"]

    runs = _timed_runs(one, args.steps, n_runs)
    best_ms = _median_ms(runs)
    dt = best_ms / 1e3

    # FLOP estimate: target fwd (full seq) + ctx fwd (enc on ctx tokens +
    # predictor) + backward (~2x fwd of trained path)
    n_full = (T // 2) * (S // 16) ** 2
    enc_f = encoder_flops(encoder.embed_dim, encoder.depth, encoder.mlp_ratio, n_full)
    ctx_f = sum(
        encoder_flops(encoder.embed_dim, encoder.depth, encoder.mlp_ratio, m.shape[-1])
        for m in me
    )
    pred_tokens = [me[i].shape[-1] + mp[i].shape[-1] for i in range(len(me))]
    pred_f = sum(encoder_flops(384, 12, 4.0, t, patch_size=0) for t in pred_tokens)
    total = B * (enc_f + 3 * (ctx_f + pred_f))
    measured = measured_peak_tflops()
    mfu = total / dt / 1e12 / measured
    return {
        "metric": (f"{args.model} masked-pretrain step time ({T}f@{S}px bs{B}"
                   + (f" accum{A}" if A > 1 else "") + " bf16)"),
        "value": round(best_ms, 2),
        "unit": "ms/step",
        "vs_baseline": round(mfu, 4),
        "extra": {
            "measured_peak_tflops": round(measured, 1),
            "mfu_vs_nominal": round(total / dt / 1e12 / chip_peak_tflops(), 4),
            "total_step_flops_T": round(total / 1e12, 2),
            "mask_lengths": {"ctx": [int(m.shape[-1]) for m in me],
                             "pred": [int(m.shape[-1]) for m in mp]},
            "grad_accum": A,
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "runs": runs,
            "agreement": _agreement(runs),
        },
    }


def bench_headline(args):
    """Driver default: ceiling + ViT-g encode + ViT-L pretrain, one line.

    Unless --no-extras, also appends COMPACT results for the rest of the
    BASELINE surface (VERDICT r3 missing-#3/#4): the AC train step
    (reference `app/vjepa_droid/train.py:403-449`), CEM planning latency
    (reference `notebooks/utils/mpc_utils.py:28-163`), the loader-fed u8
    end-to-end step, and the 64f cooldown step
    (reference `configs/train/vitl16/cooldown-256px-64f.yaml`). Each is
    guarded: a failure records an error string instead of killing the line.
    """
    peak_runs = [round(measured_peak_tflops(), 1)]
    _PEAK_CACHE.clear()
    peak_runs.append(round(measured_peak_tflops(), 1))
    _PEAK_CACHE[:] = [max(peak_runs)]  # sub-benches reuse the best estimate

    enc_args = argparse.Namespace(**vars(args))
    enc_args.model, enc_args.batch, enc_args.steps = "vit_giant", 8, 10
    encode = bench_encode(enc_args)

    pre_args = argparse.Namespace(**vars(args))
    pre_args.model, pre_args.batch, pre_args.steps, pre_args.remat = "vit_large", 8, 6, False
    pretrain = bench_pretrain(pre_args)

    out = dict(encode)  # headline metric stays the BASELINE clips/sec/chip
    out["extra"] = dict(encode["extra"])
    out["extra"]["measured_peak_tflops_runs"] = peak_runs
    # Cross-round comparability (VERDICT r3 weak-#8): the measured ceiling
    # moved 150->169 TFLOPs between rounds for platform reasons, so the
    # PINNED cross-round MFU denominator is the chip's nominal bf16 peak
    # (197 for v5e) — mfu_vs_nominal fields; vs_baseline keeps the r1-r3
    # measured-ceiling meaning for series continuity.
    out["extra"]["ceiling_policy"] = (
        "vs_baseline=MFU/measured (session ceiling, varies); "
        "mfu_vs_nominal=MFU/nominal-bf16-peak (pinned, cross-round)")
    out["extra"]["pretrain"] = {
        "metric": pretrain["metric"],
        "ms_per_step": pretrain["value"],
        "mfu_vs_measured": pretrain["vs_baseline"],
        **{k: pretrain["extra"][k] for k in
           ("mask_lengths", "runs", "agreement", "compile_s",
            "total_step_flops_T", "mfu_vs_nominal")},
    }
    if getattr(args, "no_extras", False):
        return out

    def _compact(r):
        c = {"metric": r["metric"], "value": r["value"], "unit": r["unit"],
             "mfu_vs_measured": r["vs_baseline"]}
        for k in ("agreement", "mfu_vs_nominal", "compile_s",
                  "total_step_flops_T", "clips_per_sec", "note"):
            if k in r["extra"]:
                c[k] = r["extra"][k]
        return c

    surface = [
        # (key, fn, overrides) — model/shape choices mirror each mode's
        # defaults in main(); steps kept small (compact capture, the
        # headline pair above carries the statistical weight)
        ("ac", bench_ac, dict(model="vit_large", batch=8, frames=8,
                              size=256, steps=4, remat=True,
                              remat_policy="save_attn_qkv_h")),
        ("cem", bench_cem, dict(model="vit_large", size=256, steps=5)),
        ("e2e_u8", bench_e2e, dict(model="vit_large", batch=8, frames=16,
                                   size=256, steps=12, u8=True, workers=0,
                                   remat=False)),
        ("cooldown", bench_pretrain, dict(model="vit_large", batch=12,
                                          frames=64, size=256, steps=3,
                                          accum=6, remat=True,
                                          remat_policy="save_attn_qkv_h")),
    ]
    for key, fn, overrides in surface:
        sub = argparse.Namespace(**vars(args))
        for k, v in overrides.items():
            setattr(sub, k, v)
        t0 = time.perf_counter()
        try:
            out["extra"][key] = _compact(fn(sub))
        except Exception as e:  # noqa: BLE001 — keep the headline alive
            out["extra"][key] = {"error": repr(e)[:500]}
        out["extra"][key]["wall_s"] = round(time.perf_counter() - t0, 1)
    return out


def bench_e2e(args):
    """END-TO-END real-video pretrain step (VERDICT r2 #3): mp4 decode ->
    transforms -> collator -> H2D prefetch -> jit step, on the REAL loader
    stack (`train/loop.py:Pretrainer.run`), not a synthetic feed. The
    headline is the median steady-state iteration from the trainer's own
    per-iter CSV (compile excluded); compare against the device-only step
    from `--mode pretrain` to get the loader overhead (same model config).

    Reference equivalent: the full `app/vjepa/train.py` hot loop with its
    decord/DataLoader pipeline.
    """
    import csv as _csv
    import tempfile

    import cv2

    from vjepa2_tpu.core.config import PretrainConfig
    from vjepa2_tpu.train.loop import Pretrainer

    B, T, S = args.batch, args.frames, args.size
    steps = max(args.steps, 12)
    with tempfile.TemporaryDirectory() as root:
        # synthetic mp4s at the target resolution. The MANIFEST must cover
        # `steps` batches (the map-style loader ends the epoch after
        # len(dataset)/B batches; 24 rows silently capped earlier captures at
        # 3 steps) — but cv2 encoding dominates setup wall, so write 24
        # unique files and repeat them across rows (decode cost per batch is
        # unchanged; each row decodes independently)
        n_rows = max(24, B * steps)
        manifest = os.path.join(root, "train.csv")
        paths = []
        for i in range(24):
            path = os.path.join(root, f"v{i}.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (S, S))
            rs = np.random.RandomState(i)
            base = rs.randint(0, 255, (S, S, 3), np.uint8)
            for t in range(T * 4):
                w.write(np.roll(base, 3 * t, axis=1))
            w.release()
            paths.append(path)
        with open(manifest, "w") as f:
            for i in range(n_rows):
                f.write(f"{paths[i % 24]} {i % 10}\n")

        cfg = PretrainConfig.from_dict({
            "folder": os.path.join(root, "out"),
            "data": {"datasets": [manifest], "batch_size": B, "crop_size": S,
                     "dataset_fpcs": [T], "num_workers": args.workers,
                     "patch_size": 16, "tubelet_size": 2,
                     "normalize_on_device": args.u8},
            "mask": MASK_CFGS,
            "meta": {"dtype": "bfloat16", "seed": 0, "load_checkpoint": False},
            "model": {"model_name": args.model, "pred_depth": 12,
                      "pred_embed_dim": 384, "pred_num_heads": 12,
                      "use_rope": True, "use_mask_tokens": True,
                      "use_flash": not args.no_flash,
                      "use_activation_checkpointing": args.remat,
                      "remat_policy": getattr(args, "remat_policy", None)},
            "optimization": {"epochs": 1, "ipe": steps, "warmup": 0,
                             "lr": 1e-3, "start_lr": 2e-4, "final_lr": 1e-6,
                             "weight_decay": 0.04, "final_weight_decay": 0.4},
        })
        trainer = Pretrainer(cfg)
        t0 = time.perf_counter()
        result = trainer.run(epochs=1, log_every=4)
        wall_s = time.perf_counter() - t0

        # steady-state = median iter_ms over the last half of the epoch (the
        # first logged window absorbs compile + loader warmup)
        log_path = os.path.join(cfg.folder, "log_r0.csv")
        with open(log_path) as f:
            rows = list(_csv.DictReader(f))
        iters = [float(r["iter_ms"]) for r in rows]
        tail = sorted(iters[len(iters) // 2:])
        med = tail[len(tail) // 2]
    return {
        "metric": f"{args.model} END-TO-END pretrain step, real mp4 loader "
                  f"({T}f@{S}px bs{B}, {args.workers} workers)",
        "value": round(med, 2),
        "unit": "ms/step",
        "vs_baseline": 0.0,
        "extra": {"iter_ms": [round(x, 1) for x in iters],
                  "epoch_wall_s": round(wall_s, 1),
                  "final_loss": round(result.get("loss", float("nan")), 4),
                  "clips_per_sec": round(B / (med / 1e3), 2),
                  # r2 synthetic-loader step on the same config measured
                  # 539.8 ms (BENCH_r02); the gap is host decode on this
                  # box's ONE cpu core (~18 clips/s decode-only ceiling,
                  # scripts/bench_loader.py) — real TPU-VM hosts have
                  # 14 vCPU/chip for worker overlap
                  "note": "loader-bound on 1-core host; compare --mode "
                          "pretrain for the device-only step"},
    }


def bench_ac(args):
    """AC predictor train step (teacher forcing + rollout), BASELINE config 5."""
    from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY
    from vjepa2_tpu.train.droid import (
        DroidHParams,
        init_droid_params,
        make_droid_optimizer,
        make_droid_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    B, T, S = args.batch, args.frames, args.size
    encoder = MODEL_REGISTRY[args.model](
        img_size=(S, S), num_frames=2, tubelet_size=2, use_rope=True,
        use_flash=not args.no_flash,
        use_activation_checkpointing=args.remat,
        remat_policy=getattr(args, "remat_policy", None), dtype=jnp.bfloat16
    )
    predictor = vit_ac_predictor(
        img_size=(S, S), patch_size=16, num_frames=2 * T, tubelet_size=2,
        embed_dim=encoder.embed_dim, predictor_embed_dim=1024, depth=24,
        num_heads=16, use_flash=not args.no_flash,
        use_activation_checkpointing=args.remat,
        remat_policy=getattr(args, "remat_policy", None), dtype=jnp.bfloat16,
    )
    hp = DroidHParams(total_steps=1000, warmup_steps=10, anneal_steps=100, auto_steps=2)
    params, enc_params, tpf = init_droid_params(encoder, predictor, 0, (B, T, S, S, 3))
    tx = make_droid_optimizer(hp, params_like=params)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       target_params=enc_params, opt_state=tx.init(params))
    step = jax.jit(make_droid_train_step(encoder, predictor, tx, hp, tpf), donate_argnums=(0,))
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    actions = jnp.asarray(rs.rand(B, T - 1, 7) * 0.1, jnp.float32)
    states = jnp.asarray(rs.rand(B, T, 7), jnp.float32)
    box = [state]

    def one(carry):
        box[0], m = step(box[0], clips + carry.astype(jnp.bfloat16) * 0, actions, states)
        return m["loss"]

    float(one(jnp.float32(0.0)))  # compile
    runs = _timed_runs(one, args.steps)
    best_ms = _median_ms(runs)
    # FLOP model (reference hot loop `app/vjepa_droid/train.py:403-449`):
    # per-frame target encode (B*T fake 2-frame clips, no grad) + predictor
    # teacher-forcing fwd over (T-1) frames of (tpf + 2 cond tokens) + one
    # AR rollout re-feed per auto_step + backward ~ 2x the predictor fwds
    cond = 2
    n_tf = (T - 1) * (tpf + cond)
    pred_f = encoder_flops(1024, 24, 4.0, n_tf, patch_size=0)
    ar_f = sum(
        encoder_flops(1024, 24, 4.0, (n + 1) * (tpf + cond), patch_size=0)
        for n in range(1, hp.auto_steps)
    )
    enc_f = B * T * encoder_flops(encoder.embed_dim, encoder.depth,
                                  encoder.mlp_ratio, tpf)
    total = enc_f + 3 * B * (pred_f + ar_f)
    measured = measured_peak_tflops()
    mfu = total / (best_ms / 1e3) / 1e12 / measured
    return {
        "metric": f"AC ({args.model}+pred24x1024) train step ({T}f@{S}px bs{B})",
        "value": best_ms,
        "unit": "ms/step",
        "vs_baseline": round(mfu, 4),
        "extra": {"runs": runs, "agreement": _agreement(runs),
                  "measured_peak_tflops": round(measured, 1),
                  "mfu_vs_nominal": round(
                      total / (best_ms / 1e3) / 1e12 / chip_peak_tflops(), 4),
                  "total_step_flops_T": round(total / 1e12, 2)},
    }


def bench_cem(args):
    """CEM planning latency (BASELINE config 5: rollout + energy landscape)."""
    from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY
    from vjepa2_tpu.planning import CEMConfig, WorldModel

    S = args.size
    encoder = MODEL_REGISTRY[args.model](
        img_size=(S, S), num_frames=2, tubelet_size=2, use_rope=True, dtype=jnp.bfloat16
    )
    if getattr(args, "cem_full", False):
        # production world-model scale (`hub/backbones.py:vjepa2_ac_vit_giant`
        # reference `src/hub/backbones.py:107-142`): 24x1024 AC predictor,
        # flash + DN segment kernels on the frame-causal rollout
        predictor = vit_ac_predictor(
            img_size=(S, S), patch_size=16, num_frames=16, tubelet_size=2,
            embed_dim=encoder.embed_dim, predictor_embed_dim=1024, depth=24,
            num_heads=16, use_flash=True, dtype=jnp.bfloat16,
        )
    else:
        # depth/width scaled down: the full 24x1024 AC predictor inside a
        # 10-iteration fori_loop over 100 rollout samples compiles for
        # >10 min through the dev tunnel; this keeps the program shape
        # representative. --cem-full runs the production scale.
        predictor = vit_ac_predictor(
            img_size=(S, S), patch_size=16, num_frames=16, tubelet_size=2,
            embed_dim=encoder.embed_dim, predictor_embed_dim=256, depth=4,
            num_heads=4, dtype=jnp.bfloat16,
        )
    frame = jnp.zeros((1, 2, S, S, 3), jnp.float32)
    enc_params = jax.jit(encoder.init)(jax.random.PRNGKey(0), frame)["params"]
    tpf = (S // 16) ** 2
    E = encoder.embed_dim
    pred_params = jax.jit(
        lambda k: predictor.init(
            k, jnp.zeros((1, tpf, E)), jnp.zeros((1, 1, 7)), jnp.zeros((1, 1, 7))
        )
    )(jax.random.PRNGKey(1))["params"]
    wm = WorldModel(
        encoder, enc_params, predictor, pred_params, tokens_per_frame=tpf,
        cem_config=CEMConfig(rollout=2, cem_steps=5, samples=64, topk=8),
    )
    rs = np.random.RandomState(0)
    rep = wm.encode(rs.rand(S, S, 3).astype(np.float32))
    goal = wm.encode(rs.rand(S, S, 3).astype(np.float32))
    pose = np.zeros(7, np.float32)
    wm.infer_next_action(rep, pose, goal)  # compile
    t0 = time.perf_counter()
    for i in range(args.steps):
        plan = wm.infer_next_action(rep, pose, goal, rng=jax.random.PRNGKey(i + 1))
    dt = (time.perf_counter() - t0) / args.steps
    # FLOP model (reference hot loop `notebooks/utils/mpc_utils.py:28-163`):
    # cem_steps iterations x samples rollouts; rollout step r re-feeds the
    # predictor on (r+1) frames of (tpf + 2 cond) tokens
    cfg = wm.cem_config
    cond = 2
    pred_f = sum(
        encoder_flops(predictor.predictor_embed_dim, predictor.depth, 4.0,
                      (r + 1) * (tpf + cond), patch_size=0)
        for r in range(cfg.rollout)
    )
    total = cfg.cem_steps * cfg.samples * pred_f
    measured = measured_peak_tflops()
    mfu = total / dt / 1e12 / measured
    return {
        "metric": (f"CEM plan latency ({args.model} wm, "
                   f"pred{predictor.depth}x{predictor.predictor_embed_dim}, "
                   "64 samples x 5 steps, rollout 2)"),
        "value": round(dt * 1e3, 2),
        "unit": "ms/plan",
        "vs_baseline": round(mfu, 4),
        "extra": {"measured_peak_tflops": round(measured, 1),
                  "total_plan_flops_T": round(total / 1e12, 3),
                  "predictor_scale": f"{predictor.depth}x{predictor.predictor_embed_dim}"},
    }


def _require_backend(timeout_s: float = 600.0):
    """Fail fast (with a parseable JSON line) when the device backend never
    initializes — the axon tunnel's init retries in an uninterruptible sleep
    loop forever when the remote end is down, which would otherwise hang the
    driver's end-of-round capture with no artifact at all."""
    import threading

    result = {}

    def probe():
        try:
            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in result:
        return
    err = result.get("error", f"backend init exceeded {timeout_s:.0f}s "
                              "(tunnel down?)")
    print(json.dumps({
        "metric": "benchmark aborted: device backend unreachable",
        "value": 0.0, "unit": "n/a", "vs_baseline": 0.0,
        "extra": {"error": err},
    }))
    os._exit(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="headline",
                    choices=["headline", "encode", "pretrain", "cooldown",
                             "e2e", "ac", "cem"])
    ap.add_argument("--model", default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="default 8 (cooldown: 12 = 3 x bs4 microbatches)")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=None,
                    help="default 10 (cooldown: 4 — each step is a 3-pass "
                         "accumulation at 64f)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default=None,
                    choices=["full", "save_attn", "save_attn_qkv",
                             "save_attn_qkv_h"],
                    help="remat policy under --remat (models/modules.py:"
                         "resolve_remat_policy); default: full recompute")
    ap.add_argument("--no-flash", action="store_true",
                    help="time the XLA attention path instead of the Pallas kernel")
    ap.add_argument("--workers", type=int, default=0,
                    help="e2e loader workers (0 = in-process; fastest on 1-core hosts)")
    ap.add_argument("--u8", action="store_true",
                    help="e2e: uint8 clips host-side, normalize on device "
                         "(4x less host memory traffic and H2D bytes)")
    ap.add_argument("--accum", type=int, default=1,
                    help="pretrain/cooldown: gradient-accumulation microbatches "
                         "per optimizer step (scan; one update)")
    ap.add_argument("--cem-full", action="store_true",
                    help="cem: plan with the FULL 24x1024 flash AC predictor "
                         "(the production vjepa2_ac world-model scale) instead "
                         "of the compile-friendly 4x256 probe shape")
    ap.add_argument("--no-extras", action="store_true",
                    help="headline: skip the compact ac/cem/e2e/cooldown "
                         "surface captures (fast iteration)")
    ap.add_argument("--fuse-ln", default="",
                    help="comma list of LN prologue fusions to enable for "
                         "this capture: 'qkv' (ops/ln_qkv.py), 'mlp' "
                         "(ops/ln_mlp.py), or 'qkv,mlp' (default: neither — "
                         "flip after the step A/B wins)")
    args = ap.parse_args()
    if args.fuse_ln:
        from vjepa2_tpu.models.modules import set_ln_fusions

        try:
            set_ln_fusions(args.fuse_ln)
        except ValueError as e:
            ap.error(f"--fuse-ln: {e}")
    _require_backend()

    # Mode-aware defaults. AC post-training trains encoder AND predictor
    # (reference `app/vjepa_droid/train.py:274-276`): a vit_giant's AdamW
    # state alone is ~17 GB — more than one v5e's HBM — so the single-chip
    # AC bench defaults to ViT-L at the reference droid config's 8 frames
    # (`configs/train/vitg16/droid-256px-8f.yaml`); the full-size model is
    # a mesh job (`train/droid_loop.py` shards it).
    if args.model is None:
        # pretrain defaults to ViT-L (the headline capture's model — a
        # bs8/16f vit_giant pretrain step without remat needs ~21 GB HBM)
        args.model = "vit_giant" if args.mode in ("headline", "encode") else "vit_large"
    if args.mode == "cooldown":
        # reference cooldown: 64f@256, per-GPU bs12 across 32x8 GPUs
        # (`configs/train/vitl16/cooldown-256px-64f.yaml:5-17`). One chip
        # runs it with remat + grad accumulation: bs2 microbatches x6 =
        # the reference per-GPU effective batch.
        args.mode = "pretrain"
        if args.frames is None:
            args.frames = 64
        args.remat = True
        if args.remat_policy is None:
            # policy ladder (scripts/probe_remat_cooldown.py, one-process
            # interleaved): full 6120.9 / save_attn 5029.9 / save_attn_qkv
            # 4983.1 (accum3) / save_attn_qkv_h 4869.5 ms/step at accum6 —
            # the fc1-preact saves OOM at bs4 microbatches but fit at bs2,
            # and accum6 is faster even under plain save_attn_qkv
            args.remat_policy = "save_attn_qkv_h"
        # only fill knobs the user left unset (--batch default is None so an
        # explicit --batch 8 is distinguishable from the global default)
        if args.batch is None:
            args.batch = 12
            if args.accum == 1:
                args.accum = 6
        if args.steps is None:
            args.steps = 4
    if args.batch is None:
        args.batch = 8
    if args.steps is None:
        args.steps = 10
    if args.frames is None:
        args.frames = 8 if args.mode == "ac" else 16
    if args.mode == "ac":
        # teacher-forcing + AR-rollout backward without remat holds ~24
        # predictor layers of [B, 2k, 1024] activations -> 20 GB at bs8
        args.remat = True
        if args.remat_policy is None:
            # r5s3 policy ladder (cross-process, each >5%/compounding):
            # save_attn 629.1 / save_attn_qkv 607.6 / save_attn_qkv_h
            # 572.3 ms/step — the AC shape (8f bs8) fits the fc1-preact
            # saves that OOM at the 64f cooldown shape
            args.remat_policy = "save_attn_qkv_h"

    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

    if args.model not in MODEL_REGISTRY:
        raise SystemExit(
            f"unknown model '{args.model}'; choose from: {', '.join(sorted(MODEL_REGISTRY))}"
        )
    out = {
        "headline": bench_headline,
        "encode": bench_encode,
        "pretrain": bench_pretrain,
        "e2e": bench_e2e,
        "ac": bench_ac,
        "cem": bench_cem,
    }[args.mode](args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
