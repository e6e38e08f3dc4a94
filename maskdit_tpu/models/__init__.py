from maskdit_tpu.models.dit import DIT_CONFIGS, MaskDiT, create_dit
from maskdit_tpu.models.precond import EDMPrecond, PRECOND_MODELS, create_model

__all__ = [
    "DIT_CONFIGS",
    "MaskDiT",
    "create_dit",
    "EDMPrecond",
    "PRECOND_MODELS",
    "create_model",
]
