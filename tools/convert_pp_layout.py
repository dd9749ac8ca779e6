"""Convert a run folder's orbax checkpoint between the plain and
pipeline-parallel param layouts.

Pipeline runs (`mesh.pipe > 1`) store encoder blocks STACKED along a
leading layer axis under 'encoder_blocks' (`core/pipeline.py`); plain runs
store per-layer 'blocks_i' subtrees. Resuming a run folder with a flipped
`mesh.pipe` therefore fails (with a readable error from
`train/loop.py:restore_or_init` pointing here). This tool rewrites the
latest checkpoint — params, EMA target, and every param-mirroring tree
inside the optax state (AdamW mu/nu) — into the other layout so the run
can continue under the new mesh.

The reference has no analogue (its DDP state dict has a single layout,
`app/vjepa/train.py:315-333`).

Usage:
    python tools/convert_pp_layout.py SRC_RUN_FOLDER DST_RUN_FOLDER --to pp
    python tools/convert_pp_layout.py SRC_RUN_FOLDER DST_RUN_FOLDER --to plain

Notes: the whole state is materialized on host (params + target + 2 Adam
moments — plan ~16x param bytes of RAM for big models). The optimizer's
weight-decay mask is rebuilt from config at resume time, not stored, so no
mask conversion is needed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _is_plain_encoder(tree) -> bool:
    return isinstance(tree, dict) and "blocks_0" in tree


def _is_pp_encoder_holder(tree) -> bool:
    return isinstance(tree, dict) and "encoder_blocks" in tree


def to_pp_tree(tree):
    """Recursively stack any {'encoder': {blocks_i...}} holder (params and
    the Adam mu/nu mirrors) and bare encoder trees (the EMA target)."""
    from vjepa2_tpu.core.pipeline import split_block_params

    if isinstance(tree, dict):
        if _is_plain_encoder(tree.get("encoder", None)):
            rest, stacked = split_block_params(tree["encoder"])
            out = {k: to_pp_tree(v) for k, v in tree.items() if k != "encoder"}
            out["encoder"] = rest
            out["encoder_blocks"] = stacked
            return out
        if _is_plain_encoder(tree):
            rest, stacked = split_block_params(tree)
            return {"encoder": rest, "encoder_blocks": stacked}
        return {k: to_pp_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(to_pp_tree(v) for v in tree)
    return tree


def to_plain_tree(tree, *, bare_target: bool = False):
    """Inverse: merge any 'encoder_blocks' holder back into blocks_i.

    ``bare_target=True`` unwraps {'encoder','encoder_blocks'}-only holders
    to the bare encoder tree (the plain layout's EMA target is not nested).
    """
    from vjepa2_tpu.core.pipeline import merge_block_params

    if isinstance(tree, dict):
        if _is_pp_encoder_holder(tree):
            merged = merge_block_params(tree["encoder"], tree["encoder_blocks"])
            rest_keys = {k: to_plain_tree(v) for k, v in tree.items()
                         if k not in ("encoder", "encoder_blocks")}
            if not rest_keys and bare_target:
                return merged
            rest_keys["encoder"] = merged
            return rest_keys
        return {k: to_plain_tree(v, bare_target=bare_target)
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(to_plain_tree(v, bare_target=bare_target) for v in tree)
    return tree


def convert_state(raw: dict, to: str) -> dict:
    """Convert a raw-restored TrainState dict between layouts."""
    assert to in ("pp", "plain")
    out = dict(raw)
    if to == "pp":
        if _is_pp_encoder_holder(raw["params"]):
            raise SystemExit("checkpoint is already in the pipeline layout")
        out["params"] = to_pp_tree(raw["params"])
        out["target_params"] = to_pp_tree(raw["target_params"])
        out["opt_state"] = to_pp_tree(raw["opt_state"])
    else:
        if not _is_pp_encoder_holder(raw["params"]):
            raise SystemExit("checkpoint is already in the plain layout")
        out["params"] = to_plain_tree(raw["params"])
        out["target_params"] = to_plain_tree(raw["target_params"],
                                             bare_target=True)
        out["opt_state"] = to_plain_tree(raw["opt_state"])
    return out


def convert_run_folder(src: str, dst: str, to: str, step: int | None = None) -> int:
    """Read SRC's latest (or ``step``) checkpoint, write the converted state
    at the same step under DST/ckpt. Returns the step."""
    import orbax.checkpoint as ocp

    src_dir = os.path.abspath(os.path.join(src, "ckpt"))
    mgr = ocp.CheckpointManager(src_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint under {src_dir}")
    raw = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()

    converted = convert_state(raw, to)

    dst_dir = os.path.abspath(os.path.join(dst, "ckpt"))
    os.makedirs(dst_dir, exist_ok=True)
    out_mgr = ocp.CheckpointManager(
        dst_dir, options=ocp.CheckpointManagerOptions(create=True))
    out_mgr.save(step, args=ocp.args.StandardSave(converted))
    out_mgr.wait_until_finished()
    out_mgr.close()
    return int(step)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="source run folder (contains ckpt/)")
    ap.add_argument("dst", help="destination run folder")
    ap.add_argument("--to", required=True, choices=["pp", "plain"],
                    help="target layout")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    args = ap.parse_args(argv)
    step = convert_run_folder(args.src, args.dst, args.to, args.step)
    print(f"converted {args.src} -> {args.dst} (layout={args.to}, step={step})")


if __name__ == "__main__":
    main()
