"""Input-pipeline throughput at ViT-g pretrain scale (ROADMAP r2 #5).

Generates N synthetic mp4s at the target resolution, builds the real
VideoDataset -> transforms -> DataLoader -> MaskCollator pipeline, and
measures delivered clips/s against the model step budget (ViT-g encode
measures ~18 clips/s/chip at bs8, i.e. the loader must sustain that per
chip to keep the MXU fed).

Usage: python scripts/bench_loader.py [--clips 24] [--size 256] [--frames 16]
       [--batch 8] [--workers 4] [--steps 12]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_videos(root: str, n: int, size: int, frames: int) -> str:
    import cv2

    csv = os.path.join(root, "train.csv")
    with open(csv, "w") as f:
        for i in range(n):
            path = os.path.join(root, f"v{i}.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (size, size))
            rs = np.random.RandomState(i)
            base = rs.randint(0, 255, (size, size, 3), np.uint8)
            for t in range(frames * 4):
                w.write(np.roll(base, 3 * t, axis=1))
            w.release()
            f.write(f"{path} {i % 10}\n")
    return csv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--u8", action="store_true",
                    help="uint8 deferred-normalize pipeline (device-side "
                         "normalization; 4x less host memory traffic)")
    args = ap.parse_args()

    from vjepa2_tpu.data.manager import init_video_data
    from vjepa2_tpu.data.transforms import VideoTransform
    from vjepa2_tpu.masks.multiblock3d import MaskCollator

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        csv = make_videos(root, args.clips, args.size, args.frames)
        print(f"generated {args.clips} mp4s in {time.perf_counter()-t0:.1f}s", flush=True)

        transform = VideoTransform(crop_size=args.size,
                                   normalize_on_device=args.u8)
        _, loader, _ = init_video_data(
            data_paths=[csv],
            batch_size=args.batch,
            transform=transform,
            dataset_fpcs=[args.frames],
            fps=4,
            num_workers=args.workers,
            ipe=args.steps,
        )
        coll = MaskCollator(
            [{"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
              "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
             {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
              "aspect_ratio": (0.75, 1.5), "num_blocks": 2}],
            dataset_fpcs=[args.frames], crop_size=(args.size, args.size),
        )

        it = iter(loader)
        clips_list, _, _ = next(it)  # warm workers/decoders
        n_clips = 0
        t0 = time.perf_counter()
        for i, (clips_list, _labels, _ci) in enumerate(it):
            # u8 mode ships the batch as-is (the device normalizes); the
            # float path pays the fp32 materialization the trainer would
            clips = np.asarray(clips_list[0])
            if not args.u8:
                clips = clips.astype(np.float32, copy=False)
            coll.step()
            coll(clips.shape[1], clips.shape[0])
            n_clips += clips.shape[0]
            if i + 2 >= args.steps:
                break
        dt = time.perf_counter() - t0
        cps = n_clips / dt
        print(
            f'{{"metric": "loader clips/s ({args.frames}f@{args.size}px, '
            f'{args.workers} workers)", "value": {cps:.2f}, '
            f'"per_batch_ms": {dt / max(1, n_clips // args.batch) * 1e3:.1f}}}'
        )


if __name__ == "__main__":
    main()
