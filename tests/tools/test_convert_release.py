"""`tools/convert_release.py` — one-command release-weights conversion
(VERDICT r2 #9). Fabricates a release-format torch checkpoint from the
actual reference modules (tiny dims), runs the tool, and checks the orbax
artifacts + sha256 gate. The real-data parity run stays blocked on egress
(documented in the tool's docstring); this proves the command works end to
end on a genuine `.pt`."""

import json
import os
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

from tests.reference.refimport import import_reference_models

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TOOL = os.path.join(REPO, "tools", "convert_release.py")


@pytest.fixture(scope="module")
def release_pt(tmp_path_factory):
    """Release-format dict: {"encoder": sd, "predictor": sd} with module./
    backbone. prefixes like the published files (`src/hub/backbones.py:22-28`)."""
    ref_vit, ref_pred, _ = import_reference_models()
    torch.manual_seed(0)
    enc = ref_vit.vit_tiny(img_size=(32, 32), num_frames=4, tubelet_size=2, use_rope=True)
    pred = ref_pred.vit_predictor(
        img_size=(32, 32), patch_size=16, num_frames=4, tubelet_size=2,
        embed_dim=192, predictor_embed_dim=64, depth=1, num_heads=2,
        use_mask_tokens=True, num_mask_tokens=2, use_rope=True,
    )
    path = tmp_path_factory.mktemp("release") / "vitt.pt"
    torch.save(
        {
            "encoder": {f"module.backbone.{k}": v for k, v in enc.state_dict().items()},
            "predictor": {f"module.backbone.{k}": v for k, v in pred.state_dict().items()},
        },
        path,
    )
    return str(path)


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable, TOOL] + args,
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def test_convert_release_skip_eval(release_pt, tmp_path):
    out = tmp_path / "flax"
    r = _run(["--pt", release_pt, "--model", "vit_large", "--out", str(out), "--skip-eval"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sha256(" in r.stdout
    assert os.path.isdir(out / "encoder")
    assert os.path.isdir(out / "predictor")
    # converted params load back
    from vjepa2_tpu.core.checkpoint import load_params

    params = load_params(str(out / "encoder"))
    assert "patch_embed" in params


def test_convert_release_sha_gate(release_pt, tmp_path):
    r = _run(["--pt", release_pt, "--out", str(tmp_path / "x"),
              "--expect-sha256", "0" * 64, "--skip-eval"])
    assert r.returncode != 0
    assert "mismatch" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_convert_release_full_dress_rehearsal(release_pt, tmp_path):
    """r3 (VERDICT #8): the whole sha256 -> convert -> orbax -> probe-smoke ->
    gate pipeline runs as ONE command and emits the machine-readable report —
    so the day egress opens, the real run is this command minus --tiny."""
    out = tmp_path / "flax"
    # ~10 min on a contended single-core host: orbax save + probe compile
    r = _run([
        "--pt", release_pt, "--model", "vit_large", "--out", str(out),
        "--synthetic-smoke", "--tiny",
    ], timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(out / "encoder")
    report = None
    for line in r.stdout.strip().splitlines():
        if line.startswith("{") and "parity_gate_pct" in line:
            report = json.loads(line)
    assert report is not None, r.stdout[-2000:]
    assert set(report) >= {"model", "sha256", "probe_top1", "published_top1",
                           "parity_gate_pct"}
    assert isinstance(report["probe_top1"], float)
    assert report["parity_gate_pct"] == 0.5
    assert "note" in report  # smoke runs are labeled, not silently gate-passed


@pytest.mark.slow
def test_convert_release_full_size_vit_large(tmp_path):
    """Full-size (304M-param) vit_large release-format fabrication converts
    and round-trips — the exact tensor shapes the released vitl.pt has."""
    ref_vit, ref_pred, _ = import_reference_models()
    torch.manual_seed(0)
    enc = ref_vit.vit_large(img_size=(256, 256), num_frames=16, tubelet_size=2,
                            use_rope=True)
    path = tmp_path / "vitl.pt"
    torch.save({"encoder": {f"module.backbone.{k}": v
                            for k, v in enc.state_dict().items()}}, path)
    out = tmp_path / "flax"
    r = _run(["--pt", str(path), "--model", "vit_large", "--out", str(out),
              "--skip-eval"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(out / "encoder")
    from vjepa2_tpu.core.checkpoint import load_params

    params = load_params(str(out / "encoder"))
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n > 300e6  # full-size conversion, not a truncation


@pytest.mark.slow
def test_convert_release_parity_gate_positive(release_pt, tmp_path):
    """--parity-check passes on a faithful checkpoint: the converted flax
    encoder reproduces the live torch reference forward (VERDICT r4 next-#6,
    the numerical-fidelity leg of the release gate that needs no dataset)."""
    # note: release_pt is vit_tiny-scale but carries release-format keys;
    # the parity check must build the SAME arch, so fabricate a vit_large
    # at tiny clip shape instead (RoPE models are input-size agnostic).
    ref_vit, _, _ = import_reference_models()
    torch.manual_seed(1)
    enc = ref_vit.vit_large(img_size=(32, 32), num_frames=4, tubelet_size=2,
                            use_rope=True)
    path = tmp_path / "vitl.pt"
    torch.save({"encoder": {f"module.backbone.{k}": v
                            for k, v in enc.state_dict().items()}}, path)
    r = _run(["--pt", str(path), "--model", "vit_large",
              "--out", str(tmp_path / "flax"), "--skip-eval",
              "--parity-check"], timeout=1800)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    report = [json.loads(l) for l in r.stdout.splitlines()
              if l.startswith("{")][-1]
    assert report["forward_parity_ok"] is True
    assert report["forward_parity_maxerr"] <= 5e-4


@pytest.mark.slow
def test_convert_release_parity_gate_negative_control(tmp_path):
    """The parity gate FIRES on a real deviation: --inject-parity-fault
    perturbs one converted tensor before the check (a symmetric .pt
    corruption loads identically on both sides and passes by design), and
    the tool must exit 1 with forward_parity_ok false."""
    ref_vit, _, _ = import_reference_models()
    torch.manual_seed(2)
    enc = ref_vit.vit_large(img_size=(32, 32), num_frames=4, tubelet_size=2,
                            use_rope=True)
    path = tmp_path / "vitl.pt"
    torch.save({"encoder": {f"module.backbone.{k}": v
                            for k, v in enc.state_dict().items()}}, path)
    r = _run(["--pt", str(path), "--model", "vit_large",
              "--out", str(tmp_path / "flax"), "--skip-eval",
              "--parity-check", "--inject-parity-fault"], timeout=1800)
    assert r.returncode == 1, (r.stdout[-1000:], r.stderr[-2000:])
    assert "PARITY GATE FAILED" in r.stderr
    report = [json.loads(l) for l in r.stdout.splitlines()
              if l.startswith("{")][-1]
    assert report["forward_parity_ok"] is False
