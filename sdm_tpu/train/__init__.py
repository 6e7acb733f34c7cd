from sdm_tpu.train.step import (
    TrainState,
    make_optimizer,
    reference_lr_schedule,
    make_train_step,
    create_train_state,
)
