"""Attentive-probe training, vmapped over a hyperparameter grid.

The reference trains ~20 `AttentiveClassifier` probes "in parallel" as a
Python loop of separately DDP-wrapped modules, one per (lr, wd) pair
(`evals/video_classification_frozen/eval.py:151-161,320-341`). On TPU the
whole grid is one ``jax.vmap``-batched program: probe params get a leading
[n_probes] axis, the frozen features are shared, and one jitted step trains
every probe — the MXU sees n_probes-times-larger matmuls instead of a
kernel-launch loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vjepa2_tpu.core.schedulers import cosine_wd, warmup_cosine_lr
from vjepa2_tpu.models.attentive_pooler import AttentiveClassifier


@dataclass(frozen=True)
class ProbeConfig:
    lr: float
    weight_decay: float
    final_lr: float = 0.0
    start_lr: float | None = None  # defaults to lr (reference probes warm up from ref lr)
    warmup_steps: int = 0
    # cosine WD schedule endpoint (reference `CosineWDSchedule`,
    # `evals/video_classification_frozen/eval.py:518-535`); None = constant
    final_wd: float | None = None


class ProbeGrid:
    """A grid of AttentiveClassifier probes trained on frozen features."""

    def __init__(
        self,
        probe_configs: Sequence[ProbeConfig],
        embed_dim: int,
        num_classes: int,
        num_heads: int = 12,
        depth: int = 1,
        total_steps: int = 1000,
        seed: int = 0,
    ):
        self.configs = list(probe_configs)
        self.n = len(self.configs)
        self.total_steps = total_steps
        self.model = AttentiveClassifier(
            embed_dim=embed_dim, num_heads=num_heads, depth=depth, num_classes=num_classes
        )
        self.lrs = jnp.asarray([c.lr for c in self.configs], jnp.float32)
        self.start_lrs = jnp.asarray(
            [c.start_lr if c.start_lr is not None else c.lr for c in self.configs], jnp.float32
        )
        self.final_lrs = jnp.asarray([c.final_lr for c in self.configs], jnp.float32)
        self.wds = jnp.asarray([c.weight_decay for c in self.configs], jnp.float32)
        self.final_wds = jnp.asarray(
            [c.final_wd if c.final_wd is not None else c.weight_decay
             for c in self.configs], jnp.float32)
        self.warmups = jnp.asarray([c.warmup_steps for c in self.configs], jnp.float32)
        self._adam = optax.scale_by_adam()
        self._seed = seed

    def init(self, feat_shape: tuple[int, int]) -> tuple[Any, Any, jnp.ndarray]:
        """Returns (stacked params, stacked opt state, step counter)."""
        dummy = jnp.zeros((1,) + tuple(feat_shape), jnp.float32)

        def init_one(key):
            p = self.model.init(key, dummy)["params"]
            return p, self._adam.init(p)

        keys = jax.random.split(jax.random.PRNGKey(self._seed), self.n)
        params, opt = jax.vmap(init_one)(keys)
        return params, opt, jnp.zeros([], jnp.int32)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2, 3))
    def train_step(self, params, opt, step, feats, labels):
        """One CE step for every probe. feats [B, N, D] f32, labels [B] int."""

        def one(p, o, lr_ref, start_lr, final_lr, wd_ref, final_wd, warmup):
            def loss_fn(pp):
                logits = self.model.apply({"params": pp}, feats)
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
                return ce.mean(), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, o = self._adam.update(grads, o)
            lr = warmup_cosine_lr(
                step,
                warmup_steps=warmup,
                start_lr=start_lr,
                ref_lr=lr_ref,
                t_max=self.total_steps,
                final_lr=final_lr,
            )
            # Reference probes schedule WD (cosine, full T_max) and decay
            # EVERY parameter: one AdamW param group holds all
            # named_parameters, biases/LN/query included
            # (`evals/video_classification_frozen/eval.py:468-487`).
            wd = cosine_wd(step, ref_wd=wd_ref, t_max=self.total_steps,
                           final_wd=final_wd)
            new_p = jax.tree_util.tree_map(
                lambda pp, u: pp - lr * (u + wd * pp), p, updates
            )
            acc = (logits.argmax(-1) == labels).mean()
            return new_p, o, loss, acc

        params, opt, losses, accs = jax.vmap(one, in_axes=(0,) * 8)(
            params, opt, self.lrs, self.start_lrs, self.final_lrs, self.wds,
            self.final_wds, self.warmups
        )
        return params, opt, step + 1, {"loss": losses, "acc": accs}

    @functools.partial(jax.jit, static_argnums=0)
    def eval_logits(self, params, feats):
        """[n_probes, B, num_classes] logits for frozen features."""
        return jax.vmap(lambda p: self.model.apply({"params": p}, feats))(params)

    def eval_correct(self, params, feats, labels) -> np.ndarray:
        """Per-probe #correct on a batch (summed over views upstream)."""
        logits = self.eval_logits(params, feats)
        return np.asarray((jnp.argmax(logits, -1) == labels[None, :]).sum(-1))


def warmup_cosine_probe_configs(
    grid: Sequence[dict],
) -> list[ProbeConfig]:
    """Build ProbeConfigs from the reference's ``multihead_kwargs`` grid
    (list of {"ref_lr": ..., "final_lr": ..., "ref_wd": ...})."""
    out = []
    for g in grid:
        fwd = g.get("final_wd", g.get("final_weight_decay"))
        out.append(
            ProbeConfig(
                lr=float(g.get("ref_lr", g.get("lr", 1e-3))),
                weight_decay=float(g.get("ref_wd", g.get("weight_decay", 0.0))),
                final_lr=float(g.get("final_lr", 0.0)),
                final_wd=float(fwd) if fwd is not None else None,
            )
        )
    return out
