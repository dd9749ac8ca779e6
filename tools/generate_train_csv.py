"""Build training-manifest CSVs for VideoDataset (reference
`generate_train_csv.py`, fork-only utility).

Two sources:

* ``--hf-dataset`` — mirror the reference exactly: pull video ids/labels
  from a HuggingFace dataset (e.g. HuggingFaceM4/something-something-v2)
  and join them to a local video directory.
* ``--video-dir`` — scan a directory tree; the immediate subdirectory name
  becomes the integer class label (sorted order), or 0 for a flat tree.

Output is the space-delimited ``path label`` manifest
`vjepa2_tpu/data/video_dataset.py` consumes (the reference's CSV format,
`src/datasets/video_dataset.py:169-175`).

Usage:
  python tools/generate_train_csv.py --video-dir /data/k400/train --out k400_train_paths.csv
  python tools/generate_train_csv.py --hf-dataset HuggingFaceM4/something-something-v2 \
      --hf-data-dir /data/ssv2 --video-dir /data/ssv2/videos --out ssv2_train_paths.csv
"""

from __future__ import annotations

import argparse
import os

VIDEO_EXTS = (".mp4", ".webm", ".avi", ".mov", ".mkv")


def scan_video_dir(video_dir: str) -> list[tuple[str, int]]:
    classes = sorted(
        d for d in os.listdir(video_dir) if os.path.isdir(os.path.join(video_dir, d))
    )
    label_of = {c: i for i, c in enumerate(classes)}
    rows: list[tuple[str, int]] = []
    for root, _dirs, files in os.walk(video_dir):
        rel = os.path.relpath(root, video_dir)
        top = rel.split(os.sep)[0] if rel != "." else None
        label = label_of.get(top, 0)
        for f in sorted(files):
            if f.lower().endswith(VIDEO_EXTS):
                rows.append((os.path.join(root, f), label))
    return rows


def rows_from_hf(hf_dataset: str, hf_data_dir: str | None, video_dir: str,
                 split: str = "train", ext: str = ".webm") -> list[tuple[str, int]]:
    from datasets import load_dataset  # optional dep, reference parity

    ds = load_dataset(hf_dataset, data_dir=hf_data_dir, split=split)
    labels = sorted({str(item["label"]) for item in ds})
    label_of = {c: i for i, c in enumerate(labels)}
    return [
        (os.path.join(video_dir, f"{item['video_id']}{ext}"), label_of[str(item["label"])])
        for item in ds
    ]


def write_manifest(rows, out: str) -> None:
    with open(out, "w") as f:
        for path, label in rows:
            f.write(f"{path} {label}\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--video-dir", help="local video tree (class subdirs -> labels)")
    p.add_argument("--hf-dataset", help="HuggingFace dataset name (reference mode)")
    p.add_argument("--hf-data-dir", default=None)
    p.add_argument("--split", default="train")
    p.add_argument("--ext", default=".webm")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.hf_dataset:
        if not args.video_dir:
            p.error("--hf-dataset requires --video-dir for the local video files")
        rows = rows_from_hf(args.hf_dataset, args.hf_data_dir, args.video_dir,
                            args.split, args.ext)
    elif args.video_dir:
        rows = scan_video_dir(args.video_dir)
    else:
        p.error("one of --video-dir / --hf-dataset is required")
    write_manifest(rows, args.out)
    print(f"wrote {len(rows)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
