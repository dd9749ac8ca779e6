"""Attribute the e2e pretrain-step gap: decode vs H2D transfer vs device step,
and whether the axon tunnel overlaps H2D with compute at all.

Reuses the production `Pretrainer` (same loader / collator / jitted step as
`bench.py --mode e2e --u8`), then times each phase separately:
  A. loader+stage host time per batch (decode -> transforms -> collate -> masks)
  B. device_put time per staged batch, device idle
  C. device_put latency while a long chained compute runs (overlap test)
  D. chained device-only step time over pre-staged batches
  E. full loop, sync prefetch vs threaded prefetch

Run: timeout 1800 python -u scripts/probe_e2e_overlap.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]
B, T, S = 8, 16, 256


def main():
    import cv2

    from vjepa2_tpu.core.config import PretrainConfig
    from vjepa2_tpu.train.loop import Pretrainer

    root = tempfile.mkdtemp()
    manifest = os.path.join(root, "train.csv")
    with open(manifest, "w") as f:
        for i in range(24):
            path = os.path.join(root, f"v{i}.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (S, S))
            rs = np.random.RandomState(i)
            base = rs.randint(0, 255, (S, S, 3), np.uint8)
            for t in range(T * 4):
                w.write(np.roll(base, 3 * t, axis=1))
            w.release()
            f.write(f"{path} {i % 10}\n")

    cfg = PretrainConfig.from_dict({
        "folder": os.path.join(root, "out"),
        "data": {"datasets": [manifest], "batch_size": B, "crop_size": S,
                 "dataset_fpcs": [T], "num_workers": 0,
                 "patch_size": 16, "tubelet_size": 2,
                 "normalize_on_device": True},
        "mask": MASK_CFGS,
        "meta": {"dtype": "bfloat16", "seed": 0, "load_checkpoint": False},
        "model": {"model_name": "vit_large", "pred_depth": 12,
                  "pred_embed_dim": 384, "pred_num_heads": 12,
                  "use_rope": True, "use_mask_tokens": True,
                  "use_flash": True, "use_activation_checkpointing": False},
        "optimization": {"epochs": 1, "ipe": 100, "warmup": 0,
                         "lr": 1e-3, "start_lr": 2e-4, "final_lr": 1e-6,
                         "weight_decay": 0.04, "final_weight_decay": 0.4},
    })
    trainer = Pretrainer(cfg)
    loader = trainer.make_loader()

    def forever():
        # the map-style loader yields len(dataset)/bs batches per epoch (3
        # here); chain epochs so the phases below see a steady stream
        epoch = 0
        while True:
            if hasattr(loader, "sampler") and hasattr(loader.sampler, "set_epoch"):
                loader.sampler.set_epoch(epoch)
            yield from iter(loader)
            epoch += 1

    def stage(batch):
        clips_list, _labels, _ci = batch
        clips = np.asarray(clips_list[0])
        trainer.collator.step()
        me, mp = trainer.collator(clips.shape[1], clips.shape[0])
        return clips, tuple(me), tuple(mp)

    # --- A: host-only loader+stage ---
    it = forever()
    staged, t_host = [], []
    for i in range(8):
        t0 = time.perf_counter()
        staged.append(stage(next(it)))
        t_host.append((time.perf_counter() - t0) * 1e3)
    med_host = sorted(t_host)[len(t_host) // 2]
    print(f"A host stage ms/batch: {[round(x) for x in t_host]} med={med_host:.0f}",
          flush=True)

    # --- B: device_put, device idle ---
    t_put, dev_batches = [], []
    for clips, me, mp in staged[:6]:
        t0 = time.perf_counter()
        db = jax.device_put((clips, me, mp))
        jax.block_until_ready(db[0])
        t_put.append((time.perf_counter() - t0) * 1e3)
        dev_batches.append(db)
    print(f"B device_put ms/batch (idle, {staged[0][0].nbytes / 1e6:.0f} MB clips): "
          f"{[round(x) for x in t_put]}", flush=True)

    # --- C: device_put while compute runs ---
    x = jax.device_put(np.random.rand(4096, 4096).astype(np.float32))

    @jax.jit
    def burn(a):
        return jax.lax.fori_loop(
            0, 120, lambda i, v: v @ v * 1e-3 + 1.0, a)

    float(burn(x)[0, 0])  # compile + one run
    t0 = time.perf_counter()
    out = burn(x)
    t_dispatch = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    db = jax.device_put(staged[-1][0])
    jax.block_until_ready(db)
    t_put_busy = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    float(out[0, 0])
    t_rest = (time.perf_counter() - t0) * 1e3
    print(f"C burn dispatch {t_dispatch:.0f} ms | device_put while busy "
          f"{t_put_busy:.0f} ms (idle was ~{sorted(t_put)[len(t_put)//2]:.0f}) | "
          f"burn remainder {t_rest:.0f} ms", flush=True)

    # --- D: chained device-only step over pre-staged batches ---
    state = trainer.init_state()
    step = trainer._step_fn(T)
    t0 = time.perf_counter()
    state, m = step(state, *dev_batches[0])
    float(m["loss"])
    print(f"D compile+first {time.perf_counter() - t0:.0f} s", flush=True)

    def timed_loop(label, batch_iter, n):
        nonlocal state
        last = None
        t0 = time.perf_counter()
        for i in range(n):
            state, last = step(state, *next(batch_iter))
        float(last["loss"])
        dt = (time.perf_counter() - t0) * 1e3 / n
        print(f"{label}: {dt:.0f} ms/step (n={n})", flush=True)

    import itertools
    timed_loop("D device-only chained (pre-staged)",
               itertools.cycle(dev_batches), 12)

    # --- E: full pipeline through device_prefetch, sync vs threaded ---
    from vjepa2_tpu.data.prefetch import device_prefetch

    for threaded in (False, True):
        gen = device_prefetch(forever(), size=2, transform=stage,
                              threaded=threaded)
        state, m = step(state, *next(gen))  # warm outside the timing
        last = None
        t0 = time.perf_counter()
        n = 0
        for batch in gen:
            state, last = step(state, *batch)
            n += 1
            if n >= 10:
                break
        float(last["loss"])
        dt = (time.perf_counter() - t0) * 1e3 / n
        print(f"E full pipeline threaded={threaded}: {dt:.0f} ms/step (n={n})",
              flush=True)


if __name__ == "__main__":
    main()
