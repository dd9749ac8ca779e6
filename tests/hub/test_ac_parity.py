"""Golden parity for the AC predictor vs an independent torch transcription
of the reference forward (`src/models/ac_predictor.py` + ACRoPEAttention)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from vjepa2_tpu.hub.converter import convert_ac_predictor
from vjepa2_tpu.models.ac_predictor import VisionTransformerPredictorAC


def rope_t(x, pos):
    D = x.shape[-1]
    omega = 1.0 / 10000 ** (torch.arange(D // 2, dtype=x.dtype) / (D / 2))
    freq = pos[..., None].to(x.dtype) * omega
    sin = torch.cat([freq.sin(), freq.sin()], dim=-1)
    cos = torch.cat([freq.cos(), freq.cos()], dim=-1)
    y = x.reshape(*x.shape[:-1], -1, 2)
    y = torch.stack([-y[..., 1], y[..., 0]], dim=-1).reshape(x.shape)
    return x * cos + y * sin


class TACBlock(nn.Module):
    """Torch ACBlock: interleaved [B, T*(A+HW), C]; cond tokens rotate only
    the temporal subspace; frame tokens rotate d/h/w; block-causal mask."""

    def __init__(self, dim, heads, T, hp, wp, A):
        super().__init__()
        self.h, self.T, self.hp, self.wp, self.A = heads, T, hp, wp, A
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = nn.Linear(dim, dim * 3)
        self.attn_proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_fc1 = nn.Linear(dim, dim * 4)
        self.mlp_fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        B, N, C = x.shape
        T, hp, wp, A = self.T, self.hp, self.wp, self.A
        HW = hp * wp
        h = self.h
        dh = C // h
        sub = 2 * ((dh // 3) // 2)
        y = self.norm1(x)
        qkv = self.attn_qkv(y).reshape(B, N, 3, h, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # factorized ids over the interleaved sequence, cond tokens = (t,0,0)
        ids = []
        for t in range(T):
            for a in range(A):
                ids.append((t, 0.0, 0.0))
            for p in range(HW):
                ids.append((t, (p // wp) * 1.0, (p % wp) * 1.0))
        ids = torch.tensor(ids)  # [N, 3]

        def rot(z):
            parts = []
            s = 0
            for c in range(3):
                parts.append(rope_t(z[..., s : s + sub], ids[None, None, :, c]))
                s += sub
            if s < dh:
                parts.append(z[..., s:])
            return torch.cat(parts, dim=-1)

        q, k = rot(q), rot(k)
        frame_of = torch.arange(T).repeat_interleave(A + HW)
        mask = frame_of[:, None] >= frame_of[None, :]
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask[None, None])
        o = o.transpose(1, 2).reshape(B, N, C)
        x = x + self.attn_proj(o)
        y = self.norm2(x)
        return x + self.mlp_fc2(F.gelu(self.mlp_fc1(y)))


class TACPredictor(nn.Module):
    def __init__(self, E=48, P=36, depth=2, heads=2, T=3, hp=2, wp=2):
        super().__init__()
        self.T, self.hp, self.wp = T, hp, wp
        self.embed = nn.Linear(E, P)
        self.action_enc = nn.Linear(7, P)
        self.state_enc = nn.Linear(7, P)
        self.blocks = nn.ModuleList([TACBlock(P, heads, T, hp, wp, 2) for _ in range(depth)])
        self.norm = nn.LayerNorm(P, eps=1e-6)
        self.proj = nn.Linear(P, E)

    def forward(self, x, actions, states):
        B, Nc, _ = x.shape
        T, HW = self.T, self.hp * self.wp
        z = self.embed(x).view(B, T, HW, -1)
        a = self.action_enc(actions)[:, :, None]
        s = self.state_enc(states)[:, :, None]
        z = torch.cat([a, s, z], dim=2).flatten(1, 2)
        for blk in self.blocks:
            z = blk(z)
        z = z.view(B, T, 2 + HW, -1)[:, :, 2:].flatten(1, 2)
        return self.proj(self.norm(z))

    def ref_state_dict(self):
        sd = {
            "predictor_embed.weight": self.embed.weight, "predictor_embed.bias": self.embed.bias,
            "action_encoder.weight": self.action_enc.weight, "action_encoder.bias": self.action_enc.bias,
            "state_encoder.weight": self.state_enc.weight, "state_encoder.bias": self.state_enc.bias,
            "predictor_norm.weight": self.norm.weight, "predictor_norm.bias": self.norm.bias,
            "predictor_proj.weight": self.proj.weight, "predictor_proj.bias": self.proj.bias,
        }
        for i, b in enumerate(self.blocks):
            p = f"predictor_blocks.{i}"
            sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"] = b.norm1.weight, b.norm1.bias
            sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"] = b.norm2.weight, b.norm2.bias
            sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"] = b.attn_qkv.weight, b.attn_qkv.bias
            sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"] = b.attn_proj.weight, b.attn_proj.bias
            sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"] = b.mlp_fc1.weight, b.mlp_fc1.bias
            sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"] = b.mlp_fc2.weight, b.mlp_fc2.bias
        return sd


def test_ac_predictor_parity():
    torch.manual_seed(0)
    T, hp, wp = 3, 2, 2
    tp = TACPredictor(T=T, hp=hp, wp=wp).eval()
    B = 2
    x = torch.randn(B, T * hp * wp, 48)
    actions = torch.randn(B, T, 7) * 0.1
    states = torch.randn(B, T, 7)
    with torch.no_grad():
        ref = tp(x, actions, states).numpy()

    params = convert_ac_predictor(tp.ref_state_dict())
    jp = VisionTransformerPredictorAC(
        img_size=(32, 32), patch_size=16, num_frames=2 * T, tubelet_size=2,
        embed_dim=48, predictor_embed_dim=36, depth=2, num_heads=2,
    )
    out = jp.apply(
        {"params": params},
        jnp.asarray(x.numpy()), jnp.asarray(actions.numpy()), jnp.asarray(states.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
