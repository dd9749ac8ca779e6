"""One-command released-checkpoint fidelity path (VERDICT r2 #9).

Takes a downloaded V-JEPA 2 release `.pt`, converts it to flax params, saves
an orbax artifact, smoke-runs the SSv2 attentive-probe eval on the converted
encoder, and prints the 0.5%-parity-gate comparison against the reference's
published probe numbers (BASELINE.md).

Release checkpoints (reference `src/hub/backbones.py:8,83-142`; this box has
zero egress — download elsewhere and copy the file in):

    https://dl.fbaipublicfiles.com/vjepa2/vitl.pt           (ViT-L/16 256px)
    https://dl.fbaipublicfiles.com/vjepa2/vith.pt           (ViT-H/16 256px)
    https://dl.fbaipublicfiles.com/vjepa2/vitg.pt           (ViT-g/16 256px)
    https://dl.fbaipublicfiles.com/vjepa2/vitg-384.pt       (ViT-g/16 384px)
    https://dl.fbaipublicfiles.com/vjepa2/vjepa2-ac-vitg.pt (V-JEPA 2-AC)

The reference repo publishes no sha256 for these; pass --expect-sha256 to
pin one once you have downloaded and audited a copy.

Usage:
    python tools/convert_release.py --pt /data/vitl.pt --model vit_large \
        [--out /data/vitl_flax] [--eval-config configs/eval/vitl/ssv2.yaml] \
        [--synthetic-smoke] [--expect-sha256 HEX]

With real SSv2 data wired into the eval config this runs the full probe and
compares top-1 against the published number; --synthetic-smoke instead runs
the tiny synthetic probe (proves the converted weights drive the whole eval
stack without data on disk).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The driver environment's sitecustomize registers the TPU backend and WINS
# over the JAX_PLATFORMS env var; re-apply it through jax.config so
# `JAX_PLATFORMS=cpu` callers (the release-gate rehearsal test) never touch
# the tunnel — a down tunnel otherwise hangs backend init forever.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# published attentive-probe top-1 (BASELINE.md; reference README.md:224-252)
PUBLISHED_SSV2_TOP1 = {
    "vit_large": 73.7,
    "vit_huge": None,  # not published per-dataset for ViT-H
    "vit_giant": None,
    "vit_giant_384": 77.3,
}
PARITY_GATE_PCT = 0.5

MODEL_TO_EVAL_CONFIG = {
    "vit_large": "configs/eval/vitl/ssv2.yaml",
    "vit_giant_384": "configs/eval/vitg-384/ssv2.yaml",
}

# reference arch factory per release model (`src/hub/backbones.py:13-19`)
REF_ARCH = {
    "vit_large": "vit_large",
    "vit_huge": "vit_huge",
    "vit_giant": "vit_giant_xformers",
    "vit_giant_384": "vit_giant_xformers",
}

# fp32 eager forward at tiny token counts; the converter golden tests pass
# at 5e-4 abs (`tests/reference/test_reference_parity.py:70`)
PARITY_FWD_ATOL = 5e-4


def forward_parity_maxerr(model: str, enc_state_dict, enc_params) -> float:
    """Max |flax(converted) - torch(reference)| on one fp32 forward.

    The release models are RoPE (`src/hub/backbones.py:106`), so the SAME
    weights drive a tiny 32px/4-frame clip — a 300M-param eager forward on
    8 tokens is seconds on CPU, making this a true numerical-fidelity gate
    for the conversion that needs no dataset and no TPU. Requires torch and
    the reference tree (refimport); raises RuntimeError when unavailable.
    """
    import numpy as np

    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "reference"))
        import torch
        from refimport import import_reference_models
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(f"--parity-check needs torch + the reference tree: {e}")

    ref_vit, _, _ = import_reference_models()
    t, s = 4, 32
    m = getattr(ref_vit, REF_ARCH[model])(
        img_size=(s, s), num_frames=t, tubelet_size=2, use_rope=True)
    missing, unexpected = m.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) if not isinstance(v, torch.Tensor) else v
         for k, v in enc_state_dict.items()}, strict=False)
    real_missing = [k for k in missing if "pos_embed" not in k]
    if real_missing:
        raise RuntimeError(f"reference load_state_dict missing keys: {real_missing[:5]}")
    m.eval()

    import jax.numpy as jnp

    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

    name = "vit_giant_xformers" if REF_ARCH[model] == "vit_giant_xformers" else model
    enc = MODEL_REGISTRY[name](img_size=(s, s), num_frames=t, tubelet_size=2,
                               use_rope=True)
    rs = np.random.RandomState(0)
    x = rs.randn(1, t, s, s, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    out = np.asarray(enc.apply({"params": enc_params}, jnp.asarray(x)))
    return float(np.max(np.abs(out - ref)))


def sha256_file(path: str, chunk: int = 1 << 22) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", required=True, help="downloaded release .pt file")
    ap.add_argument("--model", default="vit_large",
                    choices=["vit_large", "vit_huge", "vit_giant", "vit_giant_384"])
    ap.add_argument("--out", default=None, help="orbax output dir (default: <pt>_flax)")
    ap.add_argument("--eval-config", default=None)
    ap.add_argument("--synthetic-smoke", action="store_true",
                    help="run the probe on synthetic data (no SSv2 on disk)")
    ap.add_argument("--expect-sha256", default=None)
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="dress-rehearsal mode: shrink the probe to CI size "
                    "(the converted checkpoint still drives it)")
    ap.add_argument("--parity-check", action="store_true",
                    help="after conversion, forward the SAME weights through "
                    "the live torch reference and the converted flax encoder "
                    "on one clip and FAIL (exit 1) above 5e-4 abs — the "
                    "numerical-fidelity gate that needs no dataset")
    ap.add_argument("--inject-parity-fault", action="store_true",
                    help=argparse.SUPPRESS)  # negative-control: perturb one
    # converted tensor before --parity-check so tests can prove the gate
    # actually fires on a real deviation (a symmetric .pt corruption would
    # pass — both sides load the same bytes)
    args = ap.parse_args(argv)

    if not os.path.exists(args.pt):
        raise SystemExit(f"checkpoint not found: {args.pt}")

    digest = sha256_file(args.pt)
    print(f"sha256({os.path.basename(args.pt)}) = {digest}")
    if args.expect_sha256 and digest != args.expect_sha256.lower():
        raise SystemExit(f"sha256 mismatch: expected {args.expect_sha256}")

    # -- convert
    from vjepa2_tpu.hub.converter import (
        clean_prefixes,
        convert_encoder,
        convert_predictor,
        load_torch_checkpoint,
    )

    ckpt = load_torch_checkpoint(args.pt)
    enc_sd = ckpt.get("encoder", ckpt.get("target_encoder", ckpt))
    enc_params = convert_encoder(clean_prefixes(enc_sd))
    pred_params = None
    if "predictor" in ckpt:
        pred_params = convert_predictor(clean_prefixes(ckpt["predictor"]))
    n_enc = sum(x.size for x in __import__("jax").tree_util.tree_leaves(enc_params))
    print(f"converted encoder: {n_enc/1e6:.1f}M params"
          + (", predictor converted" if pred_params is not None else ""))

    out_dir = args.out or (os.path.splitext(args.pt)[0] + "_flax")
    from vjepa2_tpu.core.checkpoint import save_params

    save_params(os.path.join(out_dir, "encoder"), enc_params)
    if pred_params is not None:
        save_params(os.path.join(out_dir, "predictor"), pred_params)
    print(f"saved orbax params under {out_dir}")

    published = PUBLISHED_SSV2_TOP1.get(args.model)
    report = {
        "model": args.model,
        "sha256": digest,
        "probe_top1": None,
        "published_top1": published,
        "parity_gate_pct": PARITY_GATE_PCT,
    }

    if args.parity_check:
        checked = enc_params
        if args.inject_parity_fault:
            import jax

            leaves, tree = jax.tree_util.tree_flatten(checked)
            leaves = list(leaves)
            mid = len(leaves) // 2
            leaves[mid] = leaves[mid] + 0.05
            checked = jax.tree_util.tree_unflatten(tree, leaves)
        err = forward_parity_maxerr(args.model, clean_prefixes(enc_sd), checked)
        report["forward_parity_maxerr"] = err
        report["forward_parity_ok"] = bool(err <= PARITY_FWD_ATOL)
        print(f"forward parity vs live torch reference: max|d| = {err:.3e} "
              f"(gate {PARITY_FWD_ATOL:g})")
        if not report["forward_parity_ok"]:
            print(json.dumps(report))
            print("PARITY GATE FAILED: converted encoder does not reproduce "
                  "the reference forward", file=sys.stderr)
            return 1

    if args.skip_eval:
        report["note"] = "conversion only (--skip-eval); probe not run"
        print(json.dumps(report))
        return 0

    # -- SSv2 probe (real data if the config points at it; synthetic smoke
    # otherwise) through the converted torch weights
    cfg_path = args.eval_config or MODEL_TO_EVAL_CONFIG.get(args.model)
    if cfg_path is None:
        print("no published SSv2 config for this model; pass --eval-config")
        print(json.dumps(report))
        return 0
    from vjepa2_tpu.cli.eval import main as eval_main

    eval_args = ["--fname", cfg_path, "--checkpoint", args.pt]
    if args.synthetic_smoke:
        eval_args += ["--synthetic-data", "--epochs", "1"]
    if args.tiny:
        eval_args += ["--tiny"]
    result = eval_main(eval_args)
    top1 = result.get("top1") if isinstance(result, dict) else None
    report["probe_top1"] = top1
    if top1 is not None and published is not None and not (args.synthetic_smoke or args.tiny):
        report["within_gate"] = bool(abs(top1 - published) <= PARITY_GATE_PCT)
    elif args.synthetic_smoke or args.tiny:
        report["note"] = ("synthetic smoke only proves the converted weights drive "
                          "the full probe stack; run with real SSv2 data for the gate")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
