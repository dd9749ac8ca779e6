"""Tunnel-proof micro-benchmarking for device ops (r3 methodology, v3).

Lessons encoded here (each invalidated a previous round of numbers):
  1. the runtime memoizes repeated identical dispatches -> chain a data
     dependency between iterations;
  2. ``block_until_ready`` can return without executing through the tunnel
     -> end with a host value fetch;
  3. a trivial jitted call costs ~2 ms WALL through the tunnel (host-side
     dispatch), polluting any per-call loop -> run the iteration loop
     INSIDE one jit via ``lax.fori_loop`` so the tunnel sees ONE dispatch;
  4. tunnel throughput drifts between rounds and the first dispatch after
     compile eats a warm-up -> interleave variants across rounds and take
     min-of-rounds.

Usage:
    from ubench import device_ms
    ms = device_ms(lambda q: my_op(q, k, v), q)   # per-call device ms
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

INNER = 20  # kernel calls per dispatch
ROUNDS = 3


def _chained(fn, iters):
    """One jitted program running ``fn`` ``iters`` times with a data chain.

    ``fn`` maps a pytree x -> output array; the chain adds out*0 to the
    first leaf, which XLA cannot elide (the add depends on the full
    output) but costs only one elementwise pass per iteration.
    """

    def run(x):
        def body(_, x):
            leaves, treedef = jax.tree.flatten(x)
            out = fn(x)
            z = (out * 0).astype(leaves[0].dtype)
            # broadcast-compatible chain: collapse out to a scalar if shapes differ
            if z.shape != leaves[0].shape:
                z = z.reshape(-1)[:1].reshape((1,) * leaves[0].ndim)
            leaves[0] = leaves[0] + z
            return jax.tree.unflatten(treedef, leaves)

        return lax.fori_loop(0, iters, body, x)

    return jax.jit(run)


def device_ms(fn, *args, inner=INNER, rounds=ROUNDS):
    """Per-call device milliseconds of ``fn(*args)`` (min over rounds)."""
    x = args if len(args) > 1 else args[0]
    f = fn if len(args) == 1 else (lambda t: fn(*t))
    prog = _chained(f, inner)
    best = float("inf")
    for _ in range(rounds + 1):  # first round is warm-up/compile
        out = prog(x)
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf.reshape(-1)[:1])
        t0 = time.perf_counter()
        out = prog(x)
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf.reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / inner * 1000
        best = min(best, dt)
    return best


def bench_table(cases, inner=INNER, rounds=ROUNDS):
    """cases: [(name, fn, args_tuple)]. Interleaves rounds; returns
    {name: min_ms} and prints a table."""
    progs = {}
    for name, fn, args in cases:
        x = args if len(args) > 1 else args[0]
        f = fn if len(args) == 1 else (lambda t, fn=fn: fn(*t))
        progs[name] = (_chained(f, inner), x)
    res = {name: [] for name, _, _ in cases}
    for r in range(rounds + 1):
        for name, _, _ in cases:
            prog, x = progs[name]
            try:
                out = prog(x)
                leaf = jax.tree.leaves(out)[0]
                jax.device_get(leaf.reshape(-1)[:1])
                t0 = time.perf_counter()
                out = prog(x)
                leaf = jax.tree.leaves(out)[0]
                jax.device_get(leaf.reshape(-1)[:1])
                dt = (time.perf_counter() - t0) / inner * 1000
            except Exception as e:
                dt = float("nan")
                if r == 0:
                    print(f"  {name}: FAIL {type(e).__name__} {str(e)[:110]}")
            if r > 0:  # drop warm-up round
                res[name].append(dt)
    out = {}
    for name, _, _ in cases:
        vals = [x for x in res[name] if x == x]
        if vals:
            out[name] = min(vals)
            rs = " ".join(f"{x:7.3f}" for x in res[name])
            print(f"  {name:30s} min {min(vals):8.3f} ms  [{rs}]")
    return out
