from maskdit_tpu.train.loss import EDMLoss, LOSSES, mae_loss, patchify, per_patch_mean
from maskdit_tpu.train.schedules import bucket_ratio, get_mask_ratio_fn, lr_with_rampup
from maskdit_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    reparameterize_moments,
)

__all__ = [
    "EDMLoss", "LOSSES", "mae_loss", "patchify", "per_patch_mean",
    "bucket_ratio", "get_mask_ratio_fn", "lr_with_rampup", "TrainState",
    "create_train_state", "make_optimizer", "make_train_step",
    "reparameterize_moments",
]
