"""PyTorch checkpoint -> JAX params converter (numerical fidelity path).

Maps the reference's torch state dicts (`app/vjepa/train.py:318-329` format:
{"encoder", "predictor", "target_encoder", ...}; hub release format with
`module.`/`backbone.` prefixes, `src/hub/backbones.py:22-28`) onto this
package's flax param trees.

Layout rules:
* Linear:  torch [out, in]            -> flax kernel [in, out] (transpose)
* Conv3d:  torch [D, C, kt, kh, kw]   -> flax [kt, kh, kw, C, D]
* Conv2d:  torch [D, C, kh, kw]       -> flax [kh, kw, C, D]
* LayerNorm weight/bias               -> scale/bias (inside the fp32 LN wrapper)
* mask_tokens.{i} [1, 1, P]           -> stacked [num_mask_tokens, P]
* pos_embed buffers are skipped (sincos recomputed; RoPE models have none)
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def clean_prefixes(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    out = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "").replace("backbone.", "")
        out[k] = v
    return out


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_linear(tree, flax_path, sd, torch_key):
    _set(tree, flax_path + ["kernel"], _np(sd[torch_key + ".weight"]).T)
    if torch_key + ".bias" in sd:
        _set(tree, flax_path + ["bias"], _np(sd[torch_key + ".bias"]))


def _convert_ln(tree, flax_path, sd, torch_key):
    # our LayerNorm declares scale/bias in its own scope (flat — r3, so
    # neighbors can fetch them for kernel fusion)
    _set(tree, flax_path + ["scale"], _np(sd[torch_key + ".weight"]))
    _set(tree, flax_path + ["bias"], _np(sd[torch_key + ".bias"]))


def _convert_block(tree, blk_name, sd, prefix, use_silu: bool):
    _convert_ln(tree, [blk_name, "norm1"], sd, prefix + ".norm1")
    _convert_ln(tree, [blk_name, "norm2"], sd, prefix + ".norm2")
    _convert_linear(tree, [blk_name, "attn", "qkv"], sd, prefix + ".attn.qkv")
    _convert_linear(tree, [blk_name, "attn", "proj"], sd, prefix + ".attn.proj")
    if use_silu or (prefix + ".mlp.fc3.weight") in sd:
        _convert_linear(tree, [blk_name, "mlp", "fc1"], sd, prefix + ".mlp.fc1")
        _convert_linear(tree, [blk_name, "mlp", "fc2"], sd, prefix + ".mlp.fc2")
        _convert_linear(tree, [blk_name, "mlp", "fc3"], sd, prefix + ".mlp.fc3")
    else:
        _convert_linear(tree, [blk_name, "mlp", "fc1"], sd, prefix + ".mlp.fc1")
        _convert_linear(tree, [blk_name, "mlp", "fc2"], sd, prefix + ".mlp.fc2")


def convert_encoder(state_dict: Mapping[str, Any]) -> dict:
    """Torch VisionTransformer state dict -> flax params dict."""
    sd = clean_prefixes(state_dict)
    tree: dict = {}

    w = _np(sd["patch_embed.proj.weight"])
    if w.ndim == 5:  # Conv3d
        kernel = w.transpose(2, 3, 4, 1, 0)
    else:  # Conv2d
        kernel = w.transpose(2, 3, 1, 0)
    _set(tree, ["patch_embed", "proj", "kernel"], kernel)
    _set(tree, ["patch_embed", "proj", "bias"], _np(sd["patch_embed.proj.bias"]))

    depth = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        _convert_block(tree, f"blocks_{i}", sd, f"blocks.{i}", use_silu=False)
    _convert_ln(tree, ["norm"], sd, "norm")
    return tree


def convert_predictor(state_dict: Mapping[str, Any]) -> dict:
    """Torch VisionTransformerPredictor state dict -> flax params dict."""
    sd = clean_prefixes(state_dict)
    tree: dict = {}
    _convert_linear(tree, ["predictor_embed"], sd, "predictor_embed")
    _convert_linear(tree, ["predictor_proj"], sd, "predictor_proj")
    _convert_ln(tree, ["predictor_norm"], sd, "predictor_norm")

    mask_keys = sorted(
        (k for k in sd if k.startswith("mask_tokens.")), key=lambda k: int(k.split(".")[1])
    )
    if mask_keys:
        tree["mask_tokens"] = np.stack([_np(sd[k]).reshape(-1) for k in mask_keys])

    depth = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"predictor_blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        _convert_block(tree, f"predictor_blocks_{i}", sd, f"predictor_blocks.{i}", use_silu=False)
    return tree


def convert_ac_predictor(state_dict: Mapping[str, Any]) -> dict:
    """Torch VisionTransformerPredictorAC state dict -> flax params dict."""
    sd = clean_prefixes(state_dict)
    tree: dict = {}
    for name in ("predictor_embed", "action_encoder", "state_encoder", "extrinsics_encoder", "predictor_proj"):
        if name + ".weight" in sd:
            _convert_linear(tree, [name], sd, name)
    _convert_ln(tree, ["predictor_norm"], sd, "predictor_norm")
    depth = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"predictor_blocks\.(\d+)\.", k))
    )
    for i in range(depth):
        _convert_block(tree, f"predictor_blocks_{i}", sd, f"predictor_blocks.{i}", use_silu=False)
    return tree


def convert_attentive_classifier(state_dict: Mapping[str, Any]) -> dict:
    """Torch `AttentiveClassifier` state dict -> flax params dict.

    Reference layout (`src/models/attentive_pooler.py:16-124`):
    pooler.query_tokens, pooler.blocks.{i}.* (depth-1 self-attn blocks),
    pooler.cross_attention_block.{norm1,norm2,xattn.q,xattn.kv,mlp.fc1/fc2}
    (complete_block) OR pooler.cross_attention_block.{q,kv} (bare
    CrossAttention), linear.{weight,bias}.
    """
    sd = clean_prefixes(state_dict)
    tree: dict = {}
    _set(tree, ["pooler", "query_tokens"], _np(sd["pooler.query_tokens"]))
    idxs = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(r"pooler\.blocks\.(\d+)\.", k))
    })
    pool = tree["pooler"]
    for i in idxs:
        _convert_block(pool, f"blocks_{i}", sd, f"pooler.blocks.{i}", use_silu=False)
    cab = "pooler.cross_attention_block"
    if cab + ".xattn.q.weight" in sd:  # complete_block=True
        _convert_ln(pool, ["cross_attention_block", "norm1"], sd, cab + ".norm1")
        _convert_ln(pool, ["cross_attention_block", "norm2"], sd, cab + ".norm2")
        _convert_linear(pool, ["cross_attention_block", "xattn", "q"], sd, cab + ".xattn.q")
        _convert_linear(pool, ["cross_attention_block", "xattn", "kv"], sd, cab + ".xattn.kv")
        _convert_linear(pool, ["cross_attention_block", "mlp", "fc1"], sd, cab + ".mlp.fc1")
        _convert_linear(pool, ["cross_attention_block", "mlp", "fc2"], sd, cab + ".mlp.fc2")
    else:  # bare CrossAttention
        _convert_linear(pool, ["cross_attention_block", "q"], sd, cab + ".q")
        _convert_linear(pool, ["cross_attention_block", "kv"], sd, cab + ".kv")
    _convert_linear(tree, ["linear"], sd, "linear")
    return tree


def convert_checkpoint(ckpt: Mapping[str, Any]) -> dict:
    """Full reference train checkpoint -> {"encoder","predictor","target_encoder"}."""
    out = {}
    if "encoder" in ckpt:
        out["encoder"] = convert_encoder(ckpt["encoder"])
    if "predictor" in ckpt:
        out["predictor"] = convert_predictor(ckpt["predictor"])
    if "target_encoder" in ckpt:
        out["target_encoder"] = convert_encoder(ckpt["target_encoder"])
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pt checkpoint (CPU) without requiring CUDA."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# Reverse conversion: flax params -> torch-layout state dicts (for users
# migrating checkpoints back to the reference, and for round-trip tests).
# ---------------------------------------------------------------------------


def _get(tree: Mapping, path: list[str]):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _export_linear(sd, tree, flax_path, torch_key):
    sd[torch_key + ".weight"] = _get(tree, flax_path + ["kernel"]).T
    node = tree
    for p in flax_path:
        node = node.get(p, {})
    if isinstance(node, Mapping) and "bias" in node:
        sd[torch_key + ".bias"] = np.asarray(node["bias"])


def _export_ln(sd, tree, flax_path, torch_key):
    sd[torch_key + ".weight"] = _get(tree, flax_path + ["scale"])
    sd[torch_key + ".bias"] = _get(tree, flax_path + ["bias"])


def _export_block(sd, tree, blk_name, prefix):
    _export_ln(sd, tree, [blk_name, "norm1"], prefix + ".norm1")
    _export_ln(sd, tree, [blk_name, "norm2"], prefix + ".norm2")
    _export_linear(sd, tree, [blk_name, "attn", "qkv"], prefix + ".attn.qkv")
    _export_linear(sd, tree, [blk_name, "attn", "proj"], prefix + ".attn.proj")
    mlp = tree[blk_name]["mlp"]
    for fc in ("fc1", "fc2", "fc3"):
        if fc in mlp:
            _export_linear(sd, tree, [blk_name, "mlp", fc], f"{prefix}.mlp.{fc}")


def export_encoder(params: Mapping) -> dict[str, np.ndarray]:
    """flax encoder params -> torch-layout state dict (numpy values)."""
    sd: dict[str, np.ndarray] = {}
    kernel = _get(params, ["patch_embed", "proj", "kernel"])
    if kernel.ndim == 5:
        sd["patch_embed.proj.weight"] = kernel.transpose(4, 3, 0, 1, 2)
    else:
        sd["patch_embed.proj.weight"] = kernel.transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = _get(params, ["patch_embed", "proj", "bias"])
    i = 0
    while f"blocks_{i}" in params:
        _export_block(sd, params, f"blocks_{i}", f"blocks.{i}")
        i += 1
    _export_ln(sd, params, ["norm"], "norm")
    return sd


def export_predictor(params: Mapping) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    _export_linear(sd, params, ["predictor_embed"], "predictor_embed")
    _export_linear(sd, params, ["predictor_proj"], "predictor_proj")
    _export_ln(sd, params, ["predictor_norm"], "predictor_norm")
    if "mask_tokens" in params:
        mt = np.asarray(params["mask_tokens"])
        for j in range(mt.shape[0]):
            sd[f"mask_tokens.{j}"] = mt[j].reshape(1, 1, -1)
    i = 0
    while f"predictor_blocks_{i}" in params:
        _export_block(sd, params, f"predictor_blocks_{i}", f"predictor_blocks.{i}")
        i += 1
    return sd
