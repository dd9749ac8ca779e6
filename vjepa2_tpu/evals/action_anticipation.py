"""EK100 action-anticipation frozen eval
(reference `evals/action_anticipation_frozen/`).

Components:
* ``sigmoid_focal_loss`` (reference `losses.py:9`);
* ``ClassMeanRecall`` — mean-class recall@k with cross-host TP/FN reduction
  (reference `metrics.py:12-59`; here accumulation is numpy and the
  reduction a `jax` psum-style sum over processes when distributed);
* ``anticipative_features`` — encoder features + predictor queried at future
  token positions derived from the anticipation time, with autoregressive
  accumulation (reference `modelcustom/vit_encoder_predictor_concat_ar.py:151-189`);
* ``MultiHeadAttentiveClassifier`` — 3-query attentive probe emitting
  verb / noun / action logits (reference `models.py:19-68`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.models.attentive_pooler import AttentivePooler
from vjepa2_tpu.models.modules import trunc_normal


def sigmoid_focal_loss(logits, labels, alpha=0.25, gamma=2.0):
    """Mean focal BCE over a batch. logits [B, K]; labels [B] int."""
    K = logits.shape[-1]
    targets = jax.nn.one_hot(labels, K)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_bce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.sum() / logits.shape[0]


def optax_sigmoid_bce(logits, targets):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -targets * log_p - (1.0 - targets) * log_not_p


class ClassMeanRecall:
    def __init__(self, num_classes: int, k: int = 5):
        self.num_classes = num_classes
        self.k = k
        self.TP = np.zeros(num_classes)
        self.FN = np.zeros(num_classes)

    def update(self, logits: np.ndarray, labels: np.ndarray, valid_classes: Optional[set] = None):
        logits = np.asarray(logits)
        if valid_classes is not None:
            masked = np.zeros_like(logits)
            idx = np.asarray(sorted(valid_classes))
            masked[:, idx] = logits[:, idx]
            logits = masked
        preds = np.argsort(-logits, axis=1)[:, : self.k]
        labels = np.asarray(labels)
        hits = (preds == labels[:, None]).any(axis=1)
        np.add.at(self.TP, labels[hits], 1)
        np.add.at(self.FN, labels[~hits], 1)

    def compute(self, eps: float = 1e-8) -> dict:
        TP, FN = self.TP, self.FN
        if jax.process_count() > 1:  # cross-host reduction
            TP = np.asarray(
                jax.experimental.multihost_utils.process_allgather(jnp.asarray(TP))
            ).sum(0)
            FN = np.asarray(
                jax.experimental.multihost_utils.process_allgather(jnp.asarray(FN))
            ).sum(0)
        hit = (TP + FN) > 0
        nch = max(1, int(hit.sum()))
        recall = 100.0 * float((TP / (TP + FN + eps)).sum()) / nch
        total = max(1, int((TP + FN).sum()))
        acc = 100.0 * float(TP.sum()) / total
        return {"recall": recall, "accuracy": acc}


class MultiHeadAttentiveClassifier(nn.Module):
    """3 queries -> (verb, noun, action) heads."""

    embed_dim: int
    num_heads: int
    num_verbs: int
    num_nouns: int
    num_actions: int
    depth: int = 1

    @nn.compact
    def __call__(self, x):
        q = AttentivePooler(
            num_queries=3,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            depth=self.depth,
            name="pooler",
        )(x)  # [B, 3, D]
        dense = lambda d, name: nn.Dense(
            d, kernel_init=trunc_normal(0.02), bias_init=nn.initializers.zeros, name=name
        )
        verb = dense(self.num_verbs, "verb_head")(q[:, 0])
        noun = dense(self.num_nouns, "noun_head")(q[:, 1])
        action = dense(self.num_actions, "action_head")(q[:, 2])
        return verb, noun, action


def anticipative_features(
    encoder,
    enc_params,
    predictor,
    pred_params,
    clips: jnp.ndarray,
    anticipation_times: jnp.ndarray,
    frames_per_second: float,
    tubelet_size: int = 2,
    grid_size: int = 16,
    num_output_frames: int = 2,
    num_steps: int = 1,
    h_patches: Optional[int] = None,
    w_patches: Optional[int] = None,
) -> jnp.ndarray:
    """Frozen features at future positions.

    clips [B, T, H, W, C]; anticipation_times [B] seconds. Returns
    [B, N + num_steps*N_pred, D]: encoder tokens plus autoregressively
    accumulated predicted tokens.
    """
    x = encoder.apply({"params": enc_params}, clips)
    B, N, D = x.shape
    hp = h_patches or grid_size
    wp = w_patches or grid_size
    tokens_per_frame = hp * wp

    ctxt_positions = jnp.broadcast_to(jnp.arange(N), (B, N))
    anticipation_steps = (anticipation_times * frames_per_second / tubelet_size).astype(jnp.int32)
    skip = N + tokens_per_frame * anticipation_steps  # [B]
    n_pred = tokens_per_frame * (max(num_output_frames, tubelet_size) // tubelet_size)
    tgt_positions = jnp.broadcast_to(jnp.arange(n_pred), (B, n_pred)) + skip[:, None]

    accum = x
    cur = x
    for _ in range(num_steps):
        x_pred = predictor.apply(
            {"params": pred_params},
            cur,
            ctxt_positions,
            tgt_positions,
            0,
            h_patches=hp,
            w_patches=wp,
        )
        accum = jnp.concatenate([accum, x_pred], axis=1)
        cur = jnp.concatenate([cur[:, n_pred:, :], x_pred], axis=1)
    return accum


class AnticipationEval:
    """EK100 anticipation eval runner (reference
    `evals/action_anticipation_frozen/eval.py`): trains a GRID of 3-head
    attentive probes (one per ``multihead_kwargs`` entry, reference
    `eval.py:125,230`) on frozen anticipative features with focal loss. The
    grid is one vmapped program — probe params carry a leading [P] axis like
    ``ProbeGrid``. Reports per-head MAX mean-class recall@k over probes
    (reference `eval.py:705-725`); probe state checkpoints/restores for the
    reference's resume + ``val_only`` paths (`eval.py:292-308`)."""

    def __init__(
        self,
        encoder,
        enc_params,
        predictor,
        pred_params,
        num_verbs: int,
        num_nouns: int,
        num_actions: int,
        frames_per_second: float,
        probe_configs=None,
        lr: float = 1e-3,
        weight_decay: float = 0.01,
        total_steps: int = 1000,
        num_heads: int = 12,
        grid_size: int = 16,
        h_patches: int | None = None,
        w_patches: int | None = None,
        num_output_frames: int = 2,
        num_steps: int = 1,
        use_focal: bool = True,
        seed: int = 0,
    ):
        import optax

        from vjepa2_tpu.core.schedulers import warmup_cosine_lr
        from vjepa2_tpu.evals.probes import ProbeConfig

        if probe_configs is None:
            probe_configs = [ProbeConfig(lr=lr, weight_decay=weight_decay)]
        self.configs = list(probe_configs)
        self.n = len(self.configs)
        self.total_steps = total_steps
        self.model = MultiHeadAttentiveClassifier(
            embed_dim=encoder.embed_dim,
            num_heads=num_heads,
            num_verbs=num_verbs,
            num_nouns=num_nouns,
            num_actions=num_actions,
        )
        self.use_focal = use_focal
        self._adam = optax.scale_by_adam()
        self._seed = seed
        self._state = None  # (params [P,...], opt [P,...], step)

        self.lrs = jnp.asarray([c.lr for c in self.configs], jnp.float32)
        self.start_lrs = jnp.asarray(
            [c.start_lr if c.start_lr is not None else c.lr for c in self.configs], jnp.float32
        )
        self.final_lrs = jnp.asarray([c.final_lr for c in self.configs], jnp.float32)
        self.wds = jnp.asarray([c.weight_decay for c in self.configs], jnp.float32)
        self.warmups = jnp.asarray([c.warmup_steps for c in self.configs], jnp.float32)

        # params ride as jit arguments (closure capture embeds them as HLO
        # constants — fatal at ViT scale on remote-compile platforms)
        self._feat_params = {"encoder": enc_params, "predictor": pred_params}

        def feat_fn(fp, clips, at):
            return anticipative_features(
                encoder, fp["encoder"], predictor, fp["predictor"],
                clips, at,
                frames_per_second=frames_per_second,
                grid_size=grid_size,
                h_patches=h_patches,
                w_patches=w_patches,
                num_output_frames=num_output_frames,
                num_steps=num_steps,
            )

        _features_jit = jax.jit(
            lambda fp, clips, at: jax.lax.stop_gradient(feat_fn(fp, clips, at))
        )

        def _features(fp, clips, at):
            from vjepa2_tpu.ops.flash_attention import fwd_cap_override

            # forward-only program: uncapped full-N flash blocks (measured
            # win, `ops/flash_attention.py:fwd_cap_override`); the flag is
            # read at trace time, which happens inside the first call
            with fwd_cap_override(None):
                return _features_jit(fp, clips, at)

        self._features = _features

        def loss_fn(params, feats, verbs, nouns, actions):
            lv, ln, la = self.model.apply({"params": params}, feats)
            if self.use_focal:
                return (
                    sigmoid_focal_loss(lv, verbs)
                    + sigmoid_focal_loss(ln, nouns)
                    + sigmoid_focal_loss(la, actions)
                )
            import optax as _o

            return (
                _o.softmax_cross_entropy_with_integer_labels(lv, verbs).mean()
                + _o.softmax_cross_entropy_with_integer_labels(ln, nouns).mean()
                + _o.softmax_cross_entropy_with_integer_labels(la, actions).mean()
            )

        @jax.jit
        def train_step(params, opt, step, feats, verbs, nouns, actions):
            def one(p, o, lr_ref, start_lr, final_lr, wd, warmup):
                loss, grads = jax.value_and_grad(loss_fn)(p, feats, verbs, nouns, actions)
                updates, o = self._adam.update(grads, o)
                lr = warmup_cosine_lr(
                    step, warmup_steps=warmup, start_lr=start_lr, ref_lr=lr_ref,
                    t_max=self.total_steps, final_lr=final_lr,
                )
                new_p = jax.tree_util.tree_map(
                    lambda pp, u: pp - lr * (u + (wd * pp if pp.ndim >= 2 else 0.0)),
                    p, updates,
                )
                return new_p, o, loss

            params, opt, losses = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0))(
                params, opt, self.lrs, self.start_lrs, self.final_lrs, self.wds, self.warmups
            )
            return params, opt, step + 1, losses

        self._train_step = train_step
        # [P]-stacked probe logits for shared features
        self._logits = jax.jit(
            lambda p, f: jax.vmap(lambda pp: self.model.apply({"params": pp}, f))(p)
        )

    def _ensure_state(self, feats):
        if self._state is None:
            def init_one(key):
                p = self.model.init(key, feats[:1])["params"]
                return p, self._adam.init(p)

            keys = jax.random.split(jax.random.PRNGKey(self._seed), self.n)
            params, opt = jax.vmap(init_one)(keys)
            self._state = (params, opt, jnp.zeros([], jnp.int32))

    def train_batch(self, clips, anticipation_times, verbs, nouns, actions) -> float:
        feats = self._features(
            self._feat_params, jnp.asarray(clips, jnp.float32), jnp.asarray(anticipation_times)
        )
        self._ensure_state(feats)
        params, opt, step = self._state
        params, opt, step, losses = self._train_step(
            params, opt, step, feats,
            jnp.asarray(verbs), jnp.asarray(nouns), jnp.asarray(actions),
        )
        self._state = (params, opt, step)
        return float(losses.mean())

    def save_probes(self, path: str) -> None:
        """Checkpoint the probe grid (reference saves every classifier + opt
        state, `eval.py:305-308`)."""
        from vjepa2_tpu.core.checkpoint import save_params

        assert self._state is not None, "no probe state to save"
        params, opt, step = self._state
        save_params(path, {"params": params, "opt": opt, "step": step})

    def restore_probes(self, path: str, feats) -> None:
        """Restore a probe-grid checkpoint; ``feats`` is one feature batch
        used to build the shape template (reference `eval.py:292-303`)."""
        from vjepa2_tpu.core.checkpoint import load_params

        self._ensure_state(feats)
        params, opt, step = self._state
        restored = load_params(path, {"params": params, "opt": opt, "step": step})
        self._state = (restored["params"], restored["opt"], restored["step"])

    def features_for(self, clips, anticipation_times):
        """Frozen features for a raw batch (template for restore_probes)."""
        return self._features(
            self._feat_params, jnp.asarray(clips, jnp.float32), jnp.asarray(anticipation_times)
        )

    def evaluate(self, loader, k: int = 5, valid_action_classes=None) -> dict:
        assert self._state is not None, (
            "evaluate() needs probe state: train first or restore_probes()"
        )
        params, _, _ = self._state
        heads = {
            "verb": self.model.num_verbs,
            "noun": self.model.num_nouns,
            "action": self.model.num_actions,
        }
        # one recall meter per (head, probe) — reference `eval.py:618-621`
        metrics = {
            name: [ClassMeanRecall(n_cls, k=k) for _ in range(self.n)]
            for name, n_cls in heads.items()
        }
        for clips, at, verbs, nouns, actions in loader:
            feats = self._features(
                self._feat_params, jnp.asarray(clips, jnp.float32), jnp.asarray(at)
            )
            lv, ln, la = self._logits(params, feats)  # each [P, B, n_cls]
            for pi in range(self.n):
                metrics["verb"][pi].update(np.asarray(lv[pi]), verbs)
                metrics["noun"][pi].update(np.asarray(ln[pi]), nouns)
                metrics["action"][pi].update(
                    np.asarray(la[pi]), actions, valid_classes=valid_action_classes
                )
        per_probe = {
            name: [m.compute() for m in meters] for name, meters in metrics.items()
        }
        # reference reports the max over probes per head (`eval.py:705-725`)
        out = {
            name: max(vals, key=lambda d: d["recall"]) for name, vals in per_probe.items()
        }
        out["per_probe"] = per_probe
        out["best_probe"] = {
            name: int(np.argmax([d["recall"] for d in vals]))
            for name, vals in per_probe.items()
        }
        return out
