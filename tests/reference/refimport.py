"""Import helpers for the actual reference implementation at /root/reference.

The reference imports `timm.models.layers.drop_path` (its only external
model dep beyond torch, `src/models/utils/modules.py:8`); timm is not
installed here, so a faithful 3-line stub is registered before import.

The reference tree is treated as untrusted third-party code: we import its
model modules only (pure torch math, no IO).
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_timm_stub():
    if "timm.models.layers" in sys.modules:
        return
    import torch

    def drop_path(x, drop_prob: float = 0.0, training: bool = False):
        if drop_prob == 0.0 or not training:
            return x
        keep_prob = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rnd = keep_prob + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep_prob) * rnd.floor_()

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.drop_path = drop_path
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def import_reference_models():
    """Return the reference model modules (vision_transformer, predictor,
    ac_predictor, hub.backbones), importing them from /root/reference."""
    _install_timm_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.models.ac_predictor as ref_ac
    import src.models.predictor as ref_pred
    import src.models.vision_transformer as ref_vit

    return ref_vit, ref_pred, ref_ac


def import_reference_backbones():
    _install_timm_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.hub.backbones as ref_backbones

    return ref_backbones
