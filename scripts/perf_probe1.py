"""Perf probe #1: reconcile BENCH_r01 (2.21 clips/s) vs round-1 claim (13.4).

Runs on the real TPU. Measures, in one process (amortizing tunnel compiles):
  1. empirical bf16 matmul ceiling (x2 runs)
  2. vit_giant encode bs8 16f@256 — the exact driver bench — x2 independent
     timed runs with per-step times
  3. vit_large encode bs8 — x2

Writes JSON lines to .perf/probe1.jsonl as results land (poll the file).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = open("/root/repo/.perf/probe1.jsonl", "a", buffering=1)


def emit(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def timed_loop(step_fn, n_steps):
    """Chained-carry timing; returns list of per-step seconds."""
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        step_fn()
        times.append(time.perf_counter() - t0)
    return times


def measured_peak(n=8192, steps=8):
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n, n), jnp.bfloat16)
    b = jax.random.normal(k, (n, n), jnp.bfloat16)

    @jax.jit
    def mm(x, y):
        return (x @ y) * 1e-4

    x = mm(a, b)
    float(x[0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        x = mm(x, b)
    float(x[0, 0])
    dt = (time.perf_counter() - t0) / steps
    return 2 * n**3 / dt / 1e12


def encode_bench(model, B=8, T=16, S=256, steps=10):
    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

    enc = MODEL_REGISTRY[model](
        img_size=(S, S), num_frames=T, tubelet_size=2,
        use_rope=True, uniform_power=True, dtype=jnp.bfloat16,
    )
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    t0 = time.perf_counter()
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), clips)
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0

    @jax.jit
    def step(p, x, carry):
        out = enc.apply(p, x + carry)
        return out.astype(jnp.float32).mean() * 1e-30

    t0 = time.perf_counter()
    carry = step(params, clips, jnp.bfloat16(0.0))
    float(carry)
    compile_s = time.perf_counter() - t0

    results = []
    for run in range(2):
        carry_box = [carry]

        t0 = time.perf_counter()
        per_step = []
        for _ in range(steps):
            ts = time.perf_counter()
            carry_box[0] = step(params, clips, carry_box[0].astype(jnp.bfloat16))
            per_step.append(round(time.perf_counter() - ts, 4))
        float(carry_box[0])
        dt = (time.perf_counter() - t0) / steps
        carry = carry_box[0]
        results.append({
            "run": run, "clips_per_s": round(B / dt, 2),
            "ms_per_step_avg": round(dt * 1e3, 1),
            "per_step_dispatch_ms": per_step,
        })
    return {"model": model, "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1), "runs": results}


def main():
    d = jax.devices()[0]
    emit(what="device", kind=getattr(d, "device_kind", "?"), platform=d.platform)

    p1 = measured_peak()
    emit(what="measured_peak_tflops", run=0, tflops=round(p1, 1))
    p2 = measured_peak()
    emit(what="measured_peak_tflops", run=1, tflops=round(p2, 1))

    emit(what="encode", **encode_bench("vit_giant"))
    emit(what="encode", **encode_bench("vit_large"))
    emit(what="done")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
