"""Mask-ratio schedules, ratio bucketing, and LR warmup.

Reference: train_utils/helper.py:9-27 (mask-ratio schedules) and
train.py:223-225 (lr warmup by images seen). The reference accepts
'cosine2'..'cosine6' but one shipped finetune config says 'cos4'
(SURVEY.md §5); we accept both spellings and validate at construction.
"""

from __future__ import annotations

import math
from typing import Callable

MaskRatioFn = Callable[[float], float]

_VALID = (
    "constant", "linear", "exp",
    "cosine2", "cosine3", "cosine4", "cosine5", "cosine6",
)


def get_mask_ratio_fn(
    name: str = "constant", ratio_scale: float = 0.5, ratio_min: float = 0.0
) -> MaskRatioFn:
    """Progress in [0, 1] -> mask ratio (reference: helper.py:9-27)."""
    name = name.strip()
    if name.startswith("cos") and not name.startswith("cosine"):
        name = "cosine" + name[3:]  # tolerate the shipped 'cos4' typo
    if name not in _VALID:
        raise ValueError(f"unknown mask ratio function '{name}' (valid: {_VALID})")
    span = ratio_scale - ratio_min

    if name == "constant":
        return lambda x: ratio_scale
    if name == "linear":
        return lambda x: span * x + ratio_min
    if name == "exp":
        return lambda x: span * math.exp(-x * 7) + ratio_min
    power = int(name[len("cosine"):])
    return lambda x: span * math.cos(math.pi * x / 2) ** power + ratio_min


def bucket_ratio(ratio: float, length: int, granularity: int = 16) -> float:
    """Quantize a mask ratio so len_keep lands on a multiple of
    ``granularity`` tokens.

    Schedule-varying ratios would otherwise trigger one XLA recompilation
    per float value (SURVEY.md §7 hard parts); bucketing caps the number of
    distinct compiled shapes at length/granularity and keeps the packed
    sequence aligned for the MXU.
    """
    len_keep = int(length * (1.0 - ratio))
    len_keep = max(granularity, (len_keep // granularity) * granularity)
    len_keep = min(len_keep, length)
    return 1.0 - len_keep / length


def lr_with_rampup(
    step, base_lr: float, global_batch_size: int, rampup_kimg: float
):
    """LR warmup by kimg (reference: train.py:223-225).

    lr = base * min(images_seen / max(rampup_kimg * 1000, eps), 1).
    ``step`` may be a traced array (optax calls schedules under jit).
    """
    import jax.numpy as jnp

    frac = step * (global_batch_size / max(rampup_kimg * 1000.0, 1e-8))
    return base_lr * jnp.minimum(frac, 1.0)
