from vjepa2_tpu.core.config import PretrainConfig, load_config
from vjepa2_tpu.core.mesh import MeshConfig, batch_sharding, batch_spec, make_mesh, param_spec, shard_params
from vjepa2_tpu.core.optim import ema_update, make_adamw, wd_mask
from vjepa2_tpu.core.schedulers import cosine_wd, ema_momentum, warmup_cosine_lr, wsd_lr

__all__ = [
    "PretrainConfig",
    "load_config",
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "batch_spec",
    "param_spec",
    "shard_params",
    "make_adamw",
    "ema_update",
    "wd_mask",
    "warmup_cosine_lr",
    "cosine_wd",
    "wsd_lr",
    "ema_momentum",
]
