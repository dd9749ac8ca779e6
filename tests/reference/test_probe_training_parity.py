"""Probe TRAINING parity against the live reference (VERDICT r3 missing-#2).

Real-data probe accuracy (SSv2 77.3/73.7) can't be checked without the
datasets; the strongest available substitute is trained-dynamics parity:
train the reference's `AttentiveClassifier` (live torch modules from
/root/reference) and our vmapped `ProbeGrid` on IDENTICAL synthetic frozen
features, from IDENTICAL (converted) initial weights, under the reference's
exact optimizer semantics — AdamW over ONE param group (weight decay on
every parameter), `WarmupCosineLRSchedule` + `CosineWDSchedule` stepped
BEFORE each update (`evals/video_classification_frozen/eval.py:300-305,
468-535`) — and assert the per-step loss curves and final logits agree to
float tolerance. If the probe forward, AdamW math, LR/WD schedules, and
update order all line up, probe-accuracy parity on real data reduces to
feeding the same features.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference.refimport import import_reference_models
from vjepa2_tpu.evals.probes import ProbeConfig, ProbeGrid
from vjepa2_tpu.hub.converter import convert_attentive_classifier

ref_vit, _, _ = import_reference_models()  # ensures src.* import machinery


def _ref_attentive_classifier(**kw):
    import src.models.attentive_pooler as ref_pool

    return ref_pool.AttentiveClassifier(**kw)


class _RefLRSchedule:
    """Reference `WarmupCosineLRSchedule` semantics
    (`evals/video_classification_frozen/eval.py:490-516`)."""

    def __init__(self, optimizer, t_max):
        self.optimizer, self.t_max, self._step = optimizer, t_max, 0.0

    def step(self):
        self._step += 1
        for g in self.optimizer.param_groups:
            warm = g["mc_warmup_steps"]
            t = self.t_max - warm
            if self._step < warm:
                lr = g["mc_start_lr"] + (self._step / max(1, warm)) * (
                    g["mc_ref_lr"] - g["mc_start_lr"])
            else:
                prog = (self._step - warm) / max(1, t)
                lr = max(g["mc_final_lr"],
                         g["mc_final_lr"] + (g["mc_ref_lr"] - g["mc_final_lr"])
                         * 0.5 * (1.0 + math.cos(math.pi * prog)))
            g["lr"] = lr


class _RefWDSchedule:
    """Reference `CosineWDSchedule` semantics (`eval.py:518-535`)."""

    def __init__(self, optimizer, t_max):
        self.optimizer, self.t_max, self._step = optimizer, t_max, 0.0

    def step(self):
        self._step += 1
        prog = self._step / self.t_max
        for g in self.optimizer.param_groups:
            wd = g["mc_final_wd"] + (g["mc_ref_wd"] - g["mc_final_wd"]) \
                * 0.5 * (1.0 + math.cos(math.pi * prog))
            if g["mc_final_wd"] <= g["mc_ref_wd"]:
                wd = max(g["mc_final_wd"], wd)
            else:
                wd = min(g["mc_final_wd"], wd)
            g["weight_decay"] = wd


CONFIGS = [
    # (ref_lr, start_lr, final_lr, ref_wd, final_wd, warmup_steps)
    (5e-3, 1e-3, 1e-4, 0.01, 0.10, 4),   # reference-style wd ramp UP
    (1e-3, 1e-3, 0.0, 0.05, 0.05, 0),    # constant wd, no warmup
]
STEPS = 24
B, N, D, C = 16, 32, 64, 10


def _data(step):
    rs = np.random.RandomState(1000 + step)
    feats = rs.randn(B, N, D).astype(np.float32)
    labels = (np.abs(feats.mean((1, 2))) * 7919 % C).astype(np.int64)
    return feats, labels


def test_probe_training_curves_match_reference():
    # --- reference side: one torch classifier + optimizer per config
    torch.manual_seed(0)
    refs, opts, lr_scheds, wd_scheds = [], [], [], []
    for (lr, start_lr, final_lr, wd, fwd, warm) in CONFIGS:
        m = _ref_attentive_classifier(embed_dim=D, num_heads=4, depth=1,
                                      num_classes=C)
        m.train()
        group = {
            "params": list(m.parameters()),
            "mc_warmup_steps": warm, "mc_start_lr": start_lr,
            "mc_ref_lr": lr, "mc_final_lr": final_lr,
            "mc_ref_wd": wd, "mc_final_wd": fwd,
        }
        opt = torch.optim.AdamW([group])
        refs.append(m)
        opts.append(opt)
        lr_scheds.append(_RefLRSchedule(opt, STEPS))
        wd_scheds.append(_RefWDSchedule(opt, STEPS))

    # --- our side: ProbeGrid with the SAME configs and CONVERTED init
    grid = ProbeGrid(
        [ProbeConfig(lr=lr, start_lr=start_lr, final_lr=final_lr,
                     weight_decay=wd, final_wd=fwd, warmup_steps=warm)
         for (lr, start_lr, final_lr, wd, fwd, warm) in CONFIGS],
        embed_dim=D, num_classes=C, num_heads=4, depth=1, total_steps=STEPS,
    )
    converted = [convert_attentive_classifier(m.state_dict()) for m in refs]
    params = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *converted)
    opt_state = jax.vmap(grid._adam.init)(params)
    step_ctr = jnp.zeros([], jnp.int32)

    crit = torch.nn.CrossEntropyLoss()
    ref_losses = np.zeros((STEPS, len(CONFIGS)))
    our_losses = np.zeros((STEPS, len(CONFIGS)))
    for t in range(STEPS):
        feats, labels = _data(t)
        # reference update (schedulers step FIRST, as in the eval loop)
        tf, tl = torch.from_numpy(feats), torch.from_numpy(labels)
        for i, (m, opt) in enumerate(zip(refs, opts)):
            lr_scheds[i].step()
            wd_scheds[i].step()
            out = m(tf)
            loss = crit(out, tl)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ref_losses[t, i] = float(loss)
        # our update
        params, opt_state, step_ctr, metrics = grid.train_step(
            params, opt_state, step_ctr, jnp.asarray(feats), jnp.asarray(labels))
        our_losses[t] = np.asarray(metrics["loss"])

    # per-step agreement: identical math should track to float tolerance,
    # with slow drift as fp32 reduction orders differ
    rel = np.abs(our_losses - ref_losses) / np.maximum(np.abs(ref_losses), 1e-6)
    assert rel[:4].max() < 2e-4, f"early-step divergence: {rel[:4].max()}"
    assert rel.max() < 2e-2, f"curve divergence: {rel.max()} at {rel.argmax()}"
    assert rel.mean() < 5e-3, f"mean curve divergence: {rel.mean()}"

    # final logits agree on held-out features
    feats, _ = _data(10_000)
    ours = np.asarray(grid.eval_logits(params, jnp.asarray(feats)))
    with torch.no_grad():
        for i, m in enumerate(refs):
            ref = m(torch.from_numpy(feats)).numpy()
            np.testing.assert_allclose(ours[i], ref, atol=2e-2, rtol=2e-2)


def test_attentive_classifier_forward_parity():
    """Converted-weights forward parity of the probe itself (depth 2: the
    self-attn block path + cross block), live reference."""
    torch.manual_seed(1)
    m = _ref_attentive_classifier(embed_dim=D, num_heads=4, depth=2,
                                  num_classes=C)
    m.eval()
    from vjepa2_tpu.models.attentive_pooler import AttentiveClassifier

    ours = AttentiveClassifier(embed_dim=D, num_heads=4, depth=2, num_classes=C)
    params = convert_attentive_classifier(m.state_dict())
    rs = np.random.RandomState(3)
    x = rs.randn(4, N, D).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-3)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
