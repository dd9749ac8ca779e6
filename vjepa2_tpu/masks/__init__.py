from vjepa2_tpu.masks.multiblock3d import MaskCollator, MaskConfig, MaskGenerator

__all__ = ["MaskCollator", "MaskConfig", "MaskGenerator"]
