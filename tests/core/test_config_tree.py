"""Every shipped config loads; eval configs run end to end in tiny smoke
mode, proving the config-driven dispatch (plugin module_name, probe grids,
val_only inference) is reachable from YAML (reference parity: all 28
`configs/` files, `evals/video_classification_frozen/models.py:14-44`)."""

import glob
import os

import pytest
import yaml

from vjepa2_tpu.core.config import PretrainConfig

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CONFIGS = os.path.join(REPO, "configs")

TRAIN_YAMLS = sorted(glob.glob(os.path.join(CONFIGS, "train", "**", "*.yaml"), recursive=True))
EVAL_YAMLS = sorted(glob.glob(os.path.join(CONFIGS, "eval", "**", "*.yaml"), recursive=True))
INFER_YAMLS = sorted(glob.glob(os.path.join(CONFIGS, "inference", "**", "*.yaml"), recursive=True))


def test_config_tree_complete():
    """All 28 reference configs have a counterpart (+ the smoke config)."""
    rel = lambda paths: {os.path.relpath(p, CONFIGS) for p in paths}
    expected_eval = {
        f"eval/{m}/{d}.yaml"
        for m in ("vitl", "vitg-384")
        for d in ("ssv2", "k400", "coin", "jester", "diving48", "in1k", "ek100")
    }
    expected_infer = {
        f"inference/{m}/{d}.yaml"
        for m in ("vitl", "vitg-384")
        for d in ("ssv2", "diving48", "ek100")
    }
    expected_train = {
        "train/vitl16/pretrain-256px-16f.yaml",
        "train/vitl16/cooldown-256px-64f.yaml",
        "train/vith16/pretrain-256px-16f.yaml",
        "train/vith16/cooldown-256px-64f.yaml",
        "train/vitg16/pretrain-256px-16f.yaml",
        "train/vitg16/cooldown-256px-64f.yaml",
        "train/vitg16/cooldown-384px-64f.yaml",
        "train/vitg16/droid-256px-8f.yaml",
    }
    assert expected_eval <= rel(EVAL_YAMLS), expected_eval - rel(EVAL_YAMLS)
    assert expected_infer <= rel(INFER_YAMLS), expected_infer - rel(INFER_YAMLS)
    assert expected_train <= rel(TRAIN_YAMLS), expected_train - rel(TRAIN_YAMLS)


@pytest.mark.parametrize("path", TRAIN_YAMLS, ids=lambda p: os.path.relpath(p, CONFIGS))
def test_train_config_loads(path):
    cfg = PretrainConfig.from_yaml(path)
    assert cfg.data.batch_size > 0
    assert cfg.model.model_name.startswith("vit_")
    if "cooldown" in path:
        assert cfg.optimization.warmup == 0
        if "vitl16" not in path:
            assert cfg.optimization.is_anneal


@pytest.mark.parametrize("path", EVAL_YAMLS + INFER_YAMLS, ids=lambda p: os.path.relpath(p, CONFIGS))
def test_eval_config_schema(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert cfg["eval_name"] in (
        "video_classification_frozen",
        "image_classification_frozen",
        "action_anticipation_frozen",
    )
    exp = cfg["experiment"]
    assert exp["optimization"]["multihead_kwargs"]
    mdl = cfg["model_kwargs"]
    assert "module_name" in mdl
    if "inference" in path:
        assert cfg.get("val_only") is True
        g = exp["optimization"]["multihead_kwargs"][0]
        assert float(g["lr"]) == 0.0


@pytest.mark.parametrize(
    "rel",
    [
        "eval/vitl/ssv2.yaml",        # multiclip wrapper
        "eval/vitl/diving48.yaml",    # multilevel wrapper (out_layers from YAML)
        "eval/vitl/in1k.yaml",        # image plugin
        "eval/vitl/ek100.yaml",       # anticipation
    ],
)
def test_eval_config_runs_tiny(rel):
    from vjepa2_tpu.cli.eval import main

    result = main(["--fname", os.path.join(CONFIGS, rel), "--tiny"])
    assert result is not None
