"""Latent world-model wrapper for planning
(reference `notebooks/utils/world_model_wrapper.py`).

``encode`` embeds a single RGB frame with the frozen encoder (frame
duplicated to a 2-frame tubelet); ``infer_next_action`` runs the jitted CEM
over the AC predictor. Pose composition happens on device
(`vjepa2_tpu.planning.rotations`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.planning.cem import CEMConfig, make_cem
from vjepa2_tpu.train.droid import feature_layernorm


class WorldModel:
    def __init__(
        self,
        encoder,
        enc_params,
        predictor,
        pred_params,
        tokens_per_frame: int,
        preprocessor=None,
        cem_config: CEMConfig = CEMConfig(),
        normalize_reps: bool = True,
    ):
        self.encoder = encoder
        self.enc_params = enc_params
        self.predictor = predictor
        self.pred_params = pred_params
        self.tokens_per_frame = tokens_per_frame
        self.preprocessor = preprocessor
        self.cem_config = cem_config
        self.normalize_reps = normalize_reps

        def step_fn(pred_params, reps, actions, poses):
            """reps [S, T*N, D] -> next frame tokens [S, N, D]."""
            nxt = self.predictor.apply({"params": pred_params}, reps, actions, poses)
            nxt = nxt[:, -self.tokens_per_frame :]
            if self.normalize_reps:
                nxt = feature_layernorm(nxt)
            return nxt

        self._cem = make_cem(step_fn, cem_config)
        self._encode = jax.jit(self._encode_impl)

    def _encode_impl(self, enc_params, frame):
        clip = jnp.repeat(frame[None, None], 2, axis=1)  # [1, 2, H, W, C]
        h = self.encoder.apply({"params": enc_params}, clip)[0]  # [N, D]
        if self.normalize_reps:
            h = feature_layernorm(h)
        return h

    def encode(self, image: np.ndarray) -> jnp.ndarray:
        """image [H, W, 3] uint8 (or preprocessed float) -> [N, D] tokens."""
        if self.preprocessor is not None:
            image = self.preprocessor(np.asarray(image)[None])[0]
        return self._encode(self.enc_params, jnp.asarray(image, jnp.float32))

    def infer_next_action(
        self,
        rep: jnp.ndarray,
        pose: np.ndarray,
        goal_rep: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """rep/goal_rep [N, D]; pose [7] -> planned actions [rollout, 7]."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return np.asarray(self._cem(self.pred_params, rng, rep, jnp.asarray(pose, jnp.float32), goal_rep))
