"""Direct numerical parity against the ACTUAL reference implementation.

Unlike `tests/hub/test_converter_parity.py` (which compares against an
independent torch transcription), these tests import the real modules from
/root/reference (`src/models/{vision_transformer,predictor,ac_predictor}.py`,
`src/hub/backbones.py`), initialize them with torch's own init, convert the
live state dicts with `vjepa2_tpu.hub.converter`, and assert our flax
forwards reproduce the reference outputs — full, masked, nonsquare,
interpolated, sincos and RoPE paths, at fp32 and bf16 tolerances.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference.refimport import import_reference_backbones, import_reference_models
from vjepa2_tpu.hub.converter import (
    convert_ac_predictor,
    convert_encoder,
    convert_predictor,
)
from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
from vjepa2_tpu.models.predictor import vit_predictor
from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

ref_vit, ref_pred, ref_ac = import_reference_models()

B, T, S = 2, 4, 32  # 2 clips, 4 frames, 32px -> 2x2x2 = 8 tokens


def _clips(b=B, t=T, h=S, w=S, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(b, t, h, w, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # [B, C, T, H, W]
    return x, xt


@pytest.fixture(scope="module")
def ref_large_rope():
    torch.manual_seed(0)
    m = ref_vit.vit_large(img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True)
    m.eval()
    return m


@pytest.fixture(scope="module")
def ours_large_rope(ref_large_rope):
    enc = MODEL_REGISTRY["vit_large"](
        img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True
    )
    params = convert_encoder(ref_large_rope.state_dict())
    return enc, {"params": params}


def test_vit_large_rope_full(ref_large_rope, ours_large_rope):
    x, xt = _clips()
    with torch.no_grad():
        ref = ref_large_rope(xt).numpy()
    enc, variables = ours_large_rope
    # eager apply: jitting a 300M-param program for an 8-token input costs
    # minutes of XLA-CPU compile on CI hosts; eager is instant at this size
    out = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


def test_vit_large_rope_full_ln_fused(ref_large_rope, ours_large_rope):
    """Released-checkpoint fidelity holds with the LN prologue fusions on
    (FUSE_LN_QKV / FUSE_LN_MLP): off-TPU they run the fused ops'
    XLA-equivalent math, whose kernel parity is pinned interpret-mode in
    tests/ops/test_ln_{qkv,mlp}.py — together the chain proves the fused
    step reproduces the reference forward."""
    import vjepa2_tpu.models.modules as M

    x, xt = _clips()
    with torch.no_grad():
        ref = ref_large_rope(xt).numpy()
    # use_flash=True engages the FUSE_LN_QKV gate (pre-expanded rope tables
    # + head_perm); the same converted params apply
    enc = MODEL_REGISTRY["vit_large"](
        img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True,
        use_flash=True,
    )
    _, variables = ours_large_rope
    prev = (M.FUSE_LN_QKV, M.FUSE_LN_MLP)
    try:
        M.FUSE_LN_QKV = True
        M.FUSE_LN_MLP = True
        out = enc.apply(variables, jnp.asarray(x))
    finally:
        M.FUSE_LN_QKV, M.FUSE_LN_MLP = prev
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


def test_vit_large_rope_masked(ref_large_rope, ours_large_rope):
    x, xt = _clips(seed=1)
    masks = [np.array([[0, 2, 5], [1, 3, 7]]), np.array([[4, 6, 7], [0, 5, 6]])]
    with torch.no_grad():
        ref = ref_large_rope(xt, masks=[torch.from_numpy(m) for m in masks]).numpy()
    enc, variables = ours_large_rope
    out = enc.apply(variables, jnp.asarray(x), [jnp.asarray(m) for m in masks])
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


def test_vit_large_rope_nonsquare(ref_large_rope, ours_large_rope):
    """Nonsquare input: RoPE position factorization must use the input grid."""
    x, xt = _clips(h=S, w=S + 16, seed=2)  # 2x2x3 grid
    with torch.no_grad():
        ref = ref_large_rope(xt).numpy()
    enc, variables = ours_large_rope
    out = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


def test_vit_large_rope_bf16(ref_large_rope, ours_large_rope):
    """bf16 drift gate: cosine similarity per token >= 0.99 vs torch fp32."""
    x, xt = _clips(seed=3)
    with torch.no_grad():
        ref = ref_large_rope(xt).numpy()
    enc_f32, variables = ours_large_rope
    enc = MODEL_REGISTRY["vit_large"](
        img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True, dtype=jnp.bfloat16
    )
    out = np.asarray(enc.apply(variables, jnp.asarray(x)), np.float32)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.99, f"min token cosine {cos.min()}"


@pytest.fixture(scope="module")
def ref_base_sincos():
    torch.manual_seed(1)
    m = ref_vit.vit_base(
        img_size=(S, S), num_frames=8, tubelet_size=2, use_rope=False, uniform_power=True
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def ours_base_sincos(ref_base_sincos):
    enc = MODEL_REGISTRY["vit_base"](
        img_size=(S, S), num_frames=8, tubelet_size=2, use_rope=False, uniform_power=True
    )
    return enc, {"params": convert_encoder(ref_base_sincos.state_dict())}


def test_sincos_full(ref_base_sincos, ours_base_sincos):
    x, xt = _clips(t=8, seed=4)
    with torch.no_grad():
        ref = ref_base_sincos(xt).numpy()
    enc, variables = ours_base_sincos
    out = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


def test_sincos_short_clip(ref_base_sincos, ours_base_sincos):
    """Shorter clip at trained spatial size -> chop-early-frames shortcut
    (reference `interpolate_pos_encoding`, vision_transformer.py:225-229)."""
    x, xt = _clips(t=4, seed=5)
    with torch.no_grad():
        ref = ref_base_sincos(xt).numpy()
    enc, variables = ours_base_sincos
    out = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


def test_sincos_interpolated(ref_base_sincos, ours_base_sincos):
    """Larger spatial input -> trilinear pos-embed interpolation parity
    (torch F.interpolate vs jax.image.resize, both half-pixel centers)."""
    x, xt = _clips(t=8, h=48, w=48, seed=6)
    with torch.no_grad():
        ref = ref_base_sincos(xt).numpy()
    enc, variables = ours_base_sincos
    out = enc.apply(variables, jnp.asarray(x))
    # interpolation kernels differ slightly at boundaries; gate on cosine
    out = np.asarray(out, np.float32)
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, f"min token cosine {cos.min()}"


def test_predictor_parity():
    torch.manual_seed(2)
    rm = ref_pred.vit_predictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=384, depth=12, num_heads=12,
        use_mask_tokens=True, num_mask_tokens=2, zero_init_mask_tokens=False,
        use_rope=True, uniform_power=False,
    )
    rm.eval()
    ours = vit_predictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=384, depth=12, num_heads=12,
        use_mask_tokens=True, num_mask_tokens=2, zero_init_mask_tokens=False,
        use_rope=True, uniform_power=False,
    )
    params = convert_predictor(rm.state_dict())

    rs = np.random.RandomState(7)
    z = rs.randn(B, 5, 64).astype(np.float32)
    mx = np.array([[0, 2, 3, 5, 6], [1, 2, 4, 6, 7]])
    my = np.array([[1, 4, 7], [0, 3, 5]])
    with torch.no_grad():
        ref = rm(
            torch.from_numpy(z), torch.from_numpy(mx), torch.from_numpy(my), mask_index=1
        ).numpy()
    out = ours.apply(
        {"params": params}, jnp.asarray(z), jnp.asarray(mx), jnp.asarray(my), 1
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("use_extrinsics", [False, True])
def test_ac_predictor_parity(use_extrinsics):
    torch.manual_seed(3)
    Tf = 4
    rm = ref_ac.vit_ac_predictor(
        img_size=(S, S), patch_size=16, num_frames=8, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=96, depth=3, num_heads=4,
        use_extrinsics=use_extrinsics,
    )
    rm.eval()
    ours = vit_ac_predictor(
        img_size=(S, S), patch_size=16, num_frames=8, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=96, depth=3, num_heads=4,
        use_extrinsics=use_extrinsics,
    )
    params = convert_ac_predictor(rm.state_dict())

    rs = np.random.RandomState(8)
    gh = S // 16
    x = rs.randn(B, Tf * gh * gh, 64).astype(np.float32)
    actions = (rs.rand(B, Tf, 7) * 0.1).astype(np.float32)
    states = rs.rand(B, Tf, 7).astype(np.float32)
    # extrinsics are 6-dim in the reference: xyz + euler, no gripper
    # (`ac_predictor.py:56`: Linear(action_embed_dim - 1, ...))
    extr = rs.rand(B, Tf, 6).astype(np.float32)
    with torch.no_grad():
        ref = rm(
            torch.from_numpy(x), torch.from_numpy(actions), torch.from_numpy(states),
            torch.from_numpy(extr) if use_extrinsics else None,
        ).numpy()
    out = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(actions), jnp.asarray(states),
        jnp.asarray(extr) if use_extrinsics else None,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


def test_vit_giant384_architecture_parity():
    """The released giant-384 surface (`src/hub/backbones.py:145-177` ->
    `src/models/vision_transformer.py:303-315`): full giant WIDTH — embed
    1408, 22 heads (head_dim 64), mlp_ratio 48/11 — at 384px with RoPE, so
    the 384px rope-id scaling and the non-multiple-of-8 mlp hidden dim
    (1408*48/11 = 6144) run against the live reference. Depth reduced 40->4
    (pure repetition; full-depth is the RUN_GIANT_PARITY=1 test below)."""
    import functools

    torch.manual_seed(5)
    Sg, Tg = 384, 2
    rm = ref_vit.VisionTransformer(
        img_size=(Sg, Sg), patch_size=16, num_frames=Tg, tubelet_size=2,
        embed_dim=1408, depth=4, num_heads=22, mlp_ratio=48 / 11,
        qkv_bias=True,
        norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
        use_rope=True, uniform_power=False,
    )
    rm.eval()
    from vjepa2_tpu.models.vision_transformer import VisionTransformer

    ours = VisionTransformer(
        img_size=(Sg, Sg), patch_size=16, num_frames=Tg, tubelet_size=2,
        embed_dim=1408, depth=4, num_heads=22, mlp_ratio=48 / 11,
        use_rope=True, uniform_power=False,
    )
    params = convert_encoder(rm.state_dict())
    x, xt = _clips(b=1, t=Tg, h=Sg, w=Sg, seed=11)
    with torch.no_grad():
        ref = rm(xt).numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=5e-3)


FULL_GIANT = pytest.mark.skipif(
    not os.environ.get("RUN_GIANT_PARITY"),
    reason="full 1B-param giant parity: ~10 min on a 1-core host; run with "
           "RUN_GIANT_PARITY=1 (results recorded in PARITY.md)",
)


@FULL_GIANT
def test_vit_giant384_hub_full():
    """Full `vjepa2_vit_giant_384` (40-deep, 1B params) through the hub
    builders + converter — the released-checkpoint architecture end to end;
    a real-weights load differs only in the state dict's source."""
    ref_backbones = import_reference_backbones()
    torch.manual_seed(6)
    Sg, Tg = 384, 2
    r_enc, _ = ref_backbones._make_vjepa2_model(
        model_name="vit_giant_384", img_size=Sg, num_frames=Tg,
        pretrained=False,
    )
    r_enc.eval()
    from vjepa2_tpu.hub.backbones import vjepa2_vit_giant_384

    (enc, _), _ = vjepa2_vit_giant_384(num_frames=Tg)
    enc_params = convert_encoder(r_enc.state_dict())
    x, xt = _clips(b=1, t=Tg, h=Sg, w=Sg, seed=12)
    with torch.no_grad():
        ref = r_enc(xt).numpy()
    out = np.asarray(enc.apply({"params": enc_params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=5e-3)


@FULL_GIANT
def test_ac_giant_hub_full():
    """Full `_make_vjepa2_ac_model` (`src/hub/backbones.py:31-80`): the
    giant encoder + 24x1024 AC predictor state dicts through the converter,
    encode->predict chain compared on a 2-frame clip (VERDICT r3 #7)."""
    ref_backbones = import_reference_backbones()
    torch.manual_seed(7)
    Sa, Ta = 256, 2
    r_enc, r_pred = ref_backbones._make_vjepa2_ac_model(
        model_name="vit_ac_giant", img_size=Sa, num_frames=Ta,
        pretrained=False,
    )
    r_enc.eval()
    r_pred.eval()
    from vjepa2_tpu.hub.backbones import vjepa2_ac_vit_giant

    (enc, _), (pred, _) = vjepa2_ac_vit_giant(num_frames=Ta)
    enc_params = convert_encoder(r_enc.state_dict())
    pred_params = convert_ac_predictor(r_pred.state_dict())
    x, xt = _clips(b=1, t=Ta, h=Sa, w=Sa, seed=13)
    rs = np.random.RandomState(14)
    actions = (rs.rand(1, 1, 7) * 0.1).astype(np.float32)
    states = rs.rand(1, 1, 7).astype(np.float32)
    with torch.no_grad():
        zt = r_enc(xt)
        ref = r_pred(zt, torch.from_numpy(actions),
                     torch.from_numpy(states)).numpy()
    z = enc.apply({"params": enc_params}, jnp.asarray(x))
    out = np.asarray(pred.apply(
        {"params": pred_params}, z, jnp.asarray(actions), jnp.asarray(states)
    ))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=5e-3)


def test_make_vjepa2_model_wiring():
    """The hub wiring path (`src/hub/backbones.py:83-142`): build the real
    reference encoder+predictor via `_make_vjepa2_model` (pretrained=False —
    zero egress), push both live state dicts through the converter, and
    check the full encode->predict chain end to end."""
    ref_backbones = import_reference_backbones()
    torch.manual_seed(4)
    # full-size hub build (the factories pin depth/width); inputs stay tiny
    r_enc, r_pred = ref_backbones._make_vjepa2_model(
        model_name="vit_large", img_size=S, num_frames=T, pretrained=False,
    )
    r_enc.eval()
    r_pred.eval()
    enc = MODEL_REGISTRY["vit_large"](
        img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True
    )
    pred = vit_predictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=1024, predictor_embed_dim=384, depth=12, num_heads=12,
        use_mask_tokens=True, num_mask_tokens=10, use_rope=True,
    )
    enc_params = convert_encoder(r_enc.state_dict())
    pred_params = convert_predictor(r_pred.state_dict())

    x, xt = _clips(seed=9)
    mx = np.array([[0, 2, 3, 5, 6], [1, 2, 4, 6, 7]])
    my = np.array([[1, 4, 7], [0, 3, 5]])
    with torch.no_grad():
        zt = r_enc(xt, masks=[torch.from_numpy(mx)])
        ref = r_pred(zt, torch.from_numpy(mx), torch.from_numpy(my), mask_index=3).numpy()
    z = enc.apply({"params": enc_params}, jnp.asarray(x), [jnp.asarray(mx)])
    out = pred.apply(
        {"params": pred_params}, z, jnp.asarray(mx), jnp.asarray(my), 3
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
