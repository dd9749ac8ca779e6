"""DROID AC post-training driver (reference `app/vjepa_droid/train.py:main`).

Loads a pretrained V-JEPA 2 encoder (converted torch ckpt or our own
params), freezes it as the target, and trains the AC predictor with the
teacher-forcing + rollout objective under the WSD schedule.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.core.checkpoint import CheckpointManager
from vjepa2_tpu.core.config import PretrainConfig
from vjepa2_tpu.core.logging import AverageMeter, CSVLogger, get_logger
from vjepa2_tpu.core.mesh import MeshConfig, make_mesh
from vjepa2_tpu.data.droid import DROIDVideoDataset, droid_collate
from vjepa2_tpu.data.loader import DataLoader
from vjepa2_tpu.data.samplers import DistributedSampler
from vjepa2_tpu.data.transforms import VideoTransform
from vjepa2_tpu.data.video import synthetic_clip
from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY
from vjepa2_tpu.data.prefetch import device_prefetch
from vjepa2_tpu.train.droid import (
    DroidHParams,
    init_droid_params,
    jit_droid_train_step,
    make_droid_optimizer,
    make_droid_train_step,
)
from vjepa2_tpu.train.state import TrainState

logger = get_logger(__name__)


class SyntheticDroidLoader:
    def __init__(self, batch_size: int, fpc: int, crop_size: int, ipe: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        clip = synthetic_clip(fpc, crop_size, crop_size, seed).astype(np.float32) / 255.0
        self.clips = np.stack([clip] * batch_size)
        self.actions = rng.normal(size=(batch_size, fpc - 1, 7)).astype(np.float32) * 0.05
        self.states = rng.normal(size=(batch_size, fpc, 7)).astype(np.float32)
        self.extr = rng.normal(size=(batch_size, fpc, 6)).astype(np.float32)
        self.ipe = ipe

    def __iter__(self):
        for _ in range(self.ipe):
            yield self.clips, self.actions, self.states, self.extr


@dataclass
class DroidTrainer:
    cfg: PretrainConfig
    enc_params: Optional[object] = None  # pretrained encoder params (converted)
    synthetic_data: bool = False
    frames_per_clip: Optional[int] = None  # default: max(cfg.data.dataset_fpcs)

    def __post_init__(self):
        c = self.cfg
        if self.frames_per_clip is None:
            # reference: max_num_frames = max(dataset_fpcs) (`train.py:106`)
            self.frames_per_clip = max(c.data.dataset_fpcs) if c.data.dataset_fpcs else 8
        self.dtype = jnp.bfloat16 if c.meta.dtype in ("bfloat16", "bf16") else jnp.float32
        self.mesh = make_mesh(MeshConfig(c.mesh.data, c.mesh.fsdp, c.mesh.model))
        self.encoder = MODEL_REGISTRY[c.model.model_name](
            img_size=(c.data.crop_size, c.data.crop_size),
            num_frames=2,
            tubelet_size=c.data.tubelet_size,
            uniform_power=c.model.uniform_power,
            use_rope=c.model.use_rope,
            use_flash=c.model.use_flash,
            use_activation_checkpointing=c.model.use_activation_checkpointing,
            remat_policy=c.model.remat_policy,
            dtype=self.dtype,
        )
        self.predictor = vit_ac_predictor(
            img_size=(c.data.crop_size, c.data.crop_size),
            patch_size=c.data.patch_size,
            num_frames=c.model.max_num_frames,
            tubelet_size=c.data.tubelet_size,
            embed_dim=self.encoder.embed_dim,
            predictor_embed_dim=c.model.pred_embed_dim,
            depth=c.model.pred_depth,
            num_heads=c.model.pred_num_heads or 16,
            use_extrinsics=c.model.use_extrinsics,
            use_flash=c.model.use_flash,
            use_activation_checkpointing=c.model.use_activation_checkpointing,
            remat_policy=c.model.remat_policy,
            dtype=self.dtype,
        )
        o = c.optimization
        ipe = o.ipe or 100
        total = int(o.ipe_scale * o.epochs * ipe)
        self.hp = DroidHParams(
            lr=o.lr,
            start_lr=o.start_lr,
            final_lr=o.final_lr,
            warmup_steps=int(o.warmup * ipe),
            anneal_steps=int((o.anneal or 1) * ipe),
            total_steps=total,
            wd=o.weight_decay,
            final_wd=o.final_weight_decay,
            loss_exp=c.loss.loss_exp,
            auto_steps=c.loss.auto_steps,
            normalize_reps=c.loss.normalize_reps,
            enc_lr_scale=o.enc_lr_scale,
        )
        self.ipe = ipe
        self.grad_accum = max(1, int(o.grad_accum))
        if self.grad_accum > 1:
            from vjepa2_tpu.train.accum import validate_grad_accum

            validate_grad_accum(c.data.batch_size, self.grad_accum, self.mesh)
        self.tx = None  # built in run() once the param-tree shape is known
        os.makedirs(c.folder, exist_ok=True)
        keep_period = c.meta.save_every_freq * ipe if c.meta.save_every_freq else None
        self.ckpt = CheckpointManager(os.path.join(c.folder, "ckpt"), keep_period=keep_period)

    def make_loader(self):
        c = self.cfg
        if self.synthetic_data or not c.data.datasets:
            return SyntheticDroidLoader(
                c.data.batch_size, self.frames_per_clip, c.data.crop_size, self.ipe, c.meta.seed
            )
        # The reference loads every frame (init_data is called with
        # tubelet_size=1 -> frameskip=1, `app/vjepa_droid/train.py:238`,
        # `droid.py:50`), so clips/states/actions all have frames_per_clip
        # entries and line up with `encode_frames`'s per-frame encoding.
        ds = DROIDVideoDataset(
            c.data.datasets[0],
            camera_views=c.data.camera_views,
            frames_per_clip=self.frames_per_clip,
            frameskip=1,
            fps=c.data.fps,
            transform=VideoTransform(crop_size=c.data.crop_size,
                                     normalize_on_device=c.data.normalize_on_device),
            camera_frame=c.data.camera_frame,
            seed=c.meta.seed,
        )
        sampler = DistributedSampler(len(ds), jax.process_count(), jax.process_index(), seed=c.meta.seed)
        return DataLoader(
            ds, sampler, batch_size=c.data.batch_size, num_workers=c.data.num_workers,
            collate_fn=droid_collate, epoch_len=self.ipe,
        )

    def run(self, epochs: Optional[int] = None, log_every: int = 10) -> dict:
        c = self.cfg
        epochs = epochs if epochs is not None else c.optimization.epochs
        B, T, S = c.data.batch_size, self.frames_per_clip, c.data.crop_size
        params, enc_params, tpf = init_droid_params(
            self.encoder, self.predictor, c.meta.seed, (B, T, S, S, 3),
            train_encoder=self.hp.enc_lr_scale > 0,
        )
        if self.enc_params is not None:
            enc_params = self.enc_params
            if "encoder" in params:
                params["encoder"] = jax.tree_util.tree_map(jnp.copy, enc_params)
        self.tx = make_droid_optimizer(self.hp, params_like=params)
        state = TrainState(
            step=jnp.zeros([], jnp.int32), params=params, target_params=enc_params,
            opt_state=self.tx.init(params),
        )
        # shard over the mesh (reference DDP-wraps encoder+predictor for this
        # stage, `app/vjepa_droid/train.py:274-276`); state placement follows
        # the same FSDP/TP rules as pretraining
        from vjepa2_tpu.train.pretrain import shard_state

        state = shard_state(state, self.mesh)
        if self.ckpt.latest_step() is not None and c.meta.load_checkpoint:
            state = self.ckpt.restore(state)
        norm_stats = None
        if c.data.normalize_on_device:
            from vjepa2_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

            norm_stats = (IMAGENET_MEAN, IMAGENET_STD)
        step_fn = jit_droid_train_step(
            make_droid_train_step(self.encoder, self.predictor, self.tx, self.hp, tpf,
                                  norm_stats=norm_stats, grad_accum=self.grad_accum),
            self.mesh, grad_accum=self.grad_accum,
        )
        csv = CSVLogger(
            os.path.join(c.folder, f"droid_log_r{jax.process_index()}.csv"),
            ("%d", "epoch"), ("%d", "itr"), ("%.5f", "loss"), ("%.2f", "iter_ms"),
        )
        use_extr = self.cfg.model.use_extrinsics

        def stage(batch):
            clips, actions, states_p, extr = batch
            clips = np.asarray(clips)
            if clips.dtype != np.uint8:  # uint8 stays: device normalizes
                clips = clips.astype(np.float32)
            out = (
                clips,
                np.asarray(actions, np.float32),
                np.asarray(states_p, np.float32),
                np.asarray(extr, np.float32) if use_extr else None,
            )
            if self.grad_accum > 1:
                a = self.grad_accum
                out = tuple(
                    None if x is None else x.reshape(a, x.shape[0] // a, *x.shape[1:])
                    for x in out
                )
            return out

        last = float("nan")
        start_epoch = int(state.step) // self.ipe
        for epoch in range(start_epoch, epochs):
            meter, time_meter = AverageMeter(), AverageMeter()
            pending: list[tuple[int, object]] = []
            window_t0 = time.perf_counter()

            def drain():
                # fetch queued losses in one sync instead of stalling per step
                # (the pretrain loop's pending/drain pattern, `loop.py:240-254`)
                nonlocal window_t0
                if not pending:
                    return
                dt_ms = (time.perf_counter() - window_t0) * 1e3 / len(pending)
                for itr_i, m in pending:
                    loss_i = float(m["loss"])
                    assert np.isfinite(loss_i), f"non-finite loss at itr {itr_i}"
                    meter.update(loss_i)
                    time_meter.update(dt_ms)
                    csv.log(epoch, itr_i, loss_i, dt_ms)
                pending.clear()
                window_t0 = time.perf_counter()

            for itr, (clips, actions, states_p, extr) in enumerate(
                device_prefetch(self.make_loader(), size=2, transform=stage)
            ):
                state, m = step_fn(state, clips, actions, states_p, extr)
                pending.append((itr, m))
                if itr % log_every == 0 or len(pending) >= log_every:
                    drain()
                    logger.info(
                        "droid epoch %d itr %d loss %.4f (avg %.4f) %.0f ms",
                        epoch, itr, meter.val, meter.avg, time_meter.avg,
                    )
            drain()
            last = meter.avg
            self.ckpt.save(int(state.step), state, wait=True)
        return {"loss": last, "step": int(state.step)}
