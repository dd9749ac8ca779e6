"""Hub entry points (reference `hubconf.py:6-16`), torch.hub-style surface.

Usage:
    import hubconf
    (enc, enc_params), (pred, pred_params) = hubconf.vjepa2_vit_large(
        checkpoint="/path/vitl.pt")
    processor = hubconf.vjepa2_preprocessor()
"""

dependencies = ["jax", "flax", "numpy"]

from vjepa2_tpu.hub.backbones import (  # noqa: F401
    vjepa2_ac_vit_giant,
    vjepa2_vit_giant,
    vjepa2_vit_giant_384,
    vjepa2_vit_huge,
    vjepa2_vit_large,
)
from vjepa2_tpu.hub.preprocessor import vjepa2_preprocessor  # noqa: F401
