from sot_tpu.training.trainer import (  # noqa: F401
    Modules,
    TrainState,
    build_modules,
    init_state,
    make_train_step,
    make_eval_step,
    train,
)
