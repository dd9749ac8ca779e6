"""Golden numerical parity: torch reference math -> converter -> flax model.

Builds a small torch ViT (independent transcription of the reference
architecture: Conv3d tubelet embed, pre-LN blocks, tiled-frequency 3D RoPE,
exact GELU, eps=1e-6 LN), converts its state dict with
`vjepa2_tpu.hub.converter`, and checks our flax encoder/predictor reproduce
the torch outputs to fp32 tolerance. This is the checkpoint-fidelity gate
(BASELINE.md: probe parity within 0.5% requires faithful weights + forward).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vjepa2_tpu.hub.converter import convert_encoder, convert_predictor
from vjepa2_tpu.models.predictor import VisionTransformerPredictor
from vjepa2_tpu.models.vision_transformer import VisionTransformer

# ---------------------------------------------------------------------------
# minimal torch model reproducing the reference architecture (test fixture)
# ---------------------------------------------------------------------------


def rope_rotate_t(x, pos):
    D = x.shape[-1]
    omega = 1.0 / 10000 ** (torch.arange(D // 2, dtype=x.dtype) / (D / 2))
    freq = pos[..., None].to(x.dtype) * omega
    sin = torch.cat([freq.sin(), freq.sin()], dim=-1)
    cos = torch.cat([freq.cos(), freq.cos()], dim=-1)
    y = x.reshape(*x.shape[:-1], -1, 2)
    y = torch.stack([-y[..., 1], y[..., 0]], dim=-1).reshape(x.shape)
    return x * cos + y * sin


class TBlock(nn.Module):
    def __init__(self, dim, heads, use_rope, hp, wp):
        super().__init__()
        self.heads, self.use_rope, self.hp, self.wp = heads, use_rope, hp, wp
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = nn.Linear(dim, dim * 3)
        self.attn_proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_fc1 = nn.Linear(dim, dim * 4)
        self.mlp_fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x, pos):
        B, N, C = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn_qkv(y).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.use_rope:
            dh = C // h
            sub = 2 * ((dh // 3) // 2)
            tpf = self.hp * self.wp
            d_ids = pos // tpf
            rem = pos - d_ids * tpf
            h_ids = rem // self.wp
            w_ids = rem - h_ids * self.wp

            def rot(t):
                s = 0
                parts = []
                for ids in (d_ids, h_ids, w_ids):
                    parts.append(rope_rotate_t(t[..., s : s + sub], ids.float()))
                    s += sub
                if s < dh:
                    parts.append(t[..., s:])
                return torch.cat(parts, dim=-1)

            q, k = rot(q), rot(k)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, N, C)
        x = x + self.attn_proj(o)
        y = self.norm2(x)
        x = x + self.mlp_fc2(F.gelu(self.mlp_fc1(y)))
        return x


class TEncoder(nn.Module):
    def __init__(self, dim=48, depth=2, heads=2, use_rope=True, hp=2, wp=2):
        super().__init__()
        self.hp, self.wp = hp, wp
        self.patch = nn.Conv3d(3, dim, kernel_size=(2, 16, 16), stride=(2, 16, 16))
        self.blocks = nn.ModuleList([TBlock(dim, heads, use_rope, hp, wp) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, mask=None):
        # x: [B, C, T, H, W] torch layout
        t = self.patch(x)
        B, D = t.shape[0], t.shape[1]
        t = t.flatten(2).transpose(1, 2)  # [B, N, D]
        N = t.shape[1]
        if mask is not None:
            t = torch.gather(t, 1, mask.unsqueeze(-1).expand(-1, -1, D))
            pos = mask
        else:
            pos = torch.arange(N).unsqueeze(0).expand(B, -1)
        for blk in self.blocks:
            t = blk(t, pos.unsqueeze(1))  # pos broadcast over heads
        return self.norm(t)

    def ref_state_dict(self):
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch.weight
        sd["patch_embed.proj.bias"] = self.patch.bias
        for i, b in enumerate(self.blocks):
            p = f"blocks.{i}"
            sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"] = b.norm1.weight, b.norm1.bias
            sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"] = b.norm2.weight, b.norm2.bias
            sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"] = b.attn_qkv.weight, b.attn_qkv.bias
            sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"] = b.attn_proj.weight, b.attn_proj.bias
            sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"] = b.mlp_fc1.weight, b.mlp_fc1.bias
            sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"] = b.mlp_fc2.weight, b.mlp_fc2.bias
        sd["norm.weight"], sd["norm.bias"] = self.norm.weight, self.norm.bias
        return sd


@pytest.fixture(scope="module")
def torch_encoder():
    torch.manual_seed(0)
    return TEncoder().eval()


def _jax_encoder():
    return VisionTransformer(
        img_size=(32, 32), patch_size=16, num_frames=4, tubelet_size=2,
        embed_dim=48, depth=2, num_heads=2, use_rope=True,
    )


def test_encoder_parity_full(torch_encoder):
    x = torch.randn(2, 3, 4, 32, 32)
    with torch.no_grad():
        ref = torch_encoder(x).numpy()

    params = convert_encoder(torch_encoder.ref_state_dict())
    enc = _jax_encoder()
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())  # -> [B, T, H, W, C]
    out = enc.apply({"params": params}, xj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_encoder_parity_masked(torch_encoder):
    x = torch.randn(2, 3, 4, 32, 32)
    mask = torch.tensor([[0, 2, 5, 7], [1, 3, 4, 6]])
    with torch.no_grad():
        ref = torch_encoder(x, mask).numpy()
    params = convert_encoder(torch_encoder.ref_state_dict())
    enc = _jax_encoder()
    xj = jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy())
    out = enc.apply({"params": params}, xj, [jnp.asarray(mask.numpy())])
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# predictor parity
# ---------------------------------------------------------------------------


class TPredictor(nn.Module):
    """Torch transcription of the reference predictor forward (RoPE path)."""

    def __init__(self, E=48, P=32, depth=2, heads=2, num_mask_tokens=2, hp=2, wp=2):
        super().__init__()
        self.embed = nn.Linear(E, P)
        self.mask_tokens = nn.ParameterList([nn.Parameter(torch.randn(1, 1, P) * 0.02) for _ in range(num_mask_tokens)])
        self.blocks = nn.ModuleList([TBlock(P, heads, True, hp, wp) for _ in range(depth)])
        self.norm = nn.LayerNorm(P, eps=1e-6)
        self.proj = nn.Linear(P, E)

    def forward(self, x, mx, my, mask_index=0):
        B, Nc, _ = x.shape
        z = self.embed(x)
        mt = self.mask_tokens[mask_index].expand(B, my.shape[1], -1)
        tokens = torch.cat([z, mt], dim=1)
        pos = torch.cat([mx, my], dim=1)
        order = torch.argsort(pos, dim=1)
        pos_s = torch.gather(pos, 1, order)
        tokens = torch.gather(tokens, 1, order.unsqueeze(-1).expand(-1, -1, tokens.shape[-1]))
        for blk in self.blocks:
            tokens = blk(tokens, pos_s.unsqueeze(1))
        tokens = self.norm(tokens)
        inv = torch.argsort(order, dim=1)
        tokens = torch.gather(tokens, 1, inv.unsqueeze(-1).expand(-1, -1, tokens.shape[-1]))
        return self.proj(tokens[:, Nc:])

    def ref_state_dict(self):
        sd = {}
        sd["predictor_embed.weight"], sd["predictor_embed.bias"] = self.embed.weight, self.embed.bias
        for i, m in enumerate(self.mask_tokens):
            sd[f"mask_tokens.{i}"] = m
        for i, b in enumerate(self.blocks):
            p = f"predictor_blocks.{i}"
            sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"] = b.norm1.weight, b.norm1.bias
            sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"] = b.norm2.weight, b.norm2.bias
            sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"] = b.attn_qkv.weight, b.attn_qkv.bias
            sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"] = b.attn_proj.weight, b.attn_proj.bias
            sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"] = b.mlp_fc1.weight, b.mlp_fc1.bias
            sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"] = b.mlp_fc2.weight, b.mlp_fc2.bias
        sd["predictor_norm.weight"], sd["predictor_norm.bias"] = self.norm.weight, self.norm.bias
        sd["predictor_proj.weight"], sd["predictor_proj.bias"] = self.proj.weight, self.proj.bias
        return sd


def test_predictor_parity():
    torch.manual_seed(1)
    tp = TPredictor().eval()
    B, Nc, Np = 2, 4, 3
    x = torch.randn(B, Nc, 48)
    perm = torch.stack([torch.randperm(8) for _ in range(B)])
    mx, _ = torch.sort(perm[:, :Nc], dim=1)
    my, _ = torch.sort(perm[:, Nc : Nc + Np], dim=1)
    with torch.no_grad():
        ref = tp(x, mx, my, mask_index=1).numpy()

    params = convert_predictor(tp.ref_state_dict())
    jp = VisionTransformerPredictor(
        img_size=(32, 32), patch_size=16, num_frames=4, tubelet_size=2,
        embed_dim=48, predictor_embed_dim=32, depth=2, num_heads=2,
        use_mask_tokens=True, num_mask_tokens=2, use_rope=True,
    )
    out = jp.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(mx.numpy()), jnp.asarray(my.numpy()), 1
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_converter_roundtrip(torch_encoder):
    """convert -> export -> convert is the identity."""
    from vjepa2_tpu.hub.converter import convert_encoder, export_encoder

    params = convert_encoder(torch_encoder.ref_state_dict())
    sd = export_encoder(params)
    params2 = convert_encoder(sd)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
