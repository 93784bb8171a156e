from .checkpoints import restore_checkpoint, save_checkpoint  # noqa: F401
from .trainer import (  # noqa: F401
    TrainState,
    count_params,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_step,
    merge_params,
    partition_params,
    trainable_mask_path,
)
