from .loss import rgb_loss, mask_alpha_loss
from .solver import (make_optimizer, make_frozen_mask, make_lr_schedule,
                     make_warmup_multistep)
from .trainer import (TrainBatch, StepMetrics, make_train_step,
                      make_train_epoch, make_pool, shard_pool, do_train)
from .checkpoint import (save_checkpoint, load_checkpoint, latest_checkpoint,
                         load_params_any, export_reference_checkpoint)

__all__ = [
    "rgb_loss", "mask_alpha_loss", "make_optimizer", "make_frozen_mask",
    "make_lr_schedule", "make_warmup_multistep",
    "TrainBatch", "StepMetrics", "make_train_step", "make_train_epoch",
    "make_pool", "shard_pool", "do_train", "save_checkpoint", "load_checkpoint",
    "latest_checkpoint", "load_params_any", "export_reference_checkpoint",
]
