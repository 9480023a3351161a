from ubresnet_tpu.train.step import (  # noqa: F401
    TrainState,
    init_model,
    create_train_state,
    build_train_step,
    build_eval_step,
)
from ubresnet_tpu.train.metrics import AverageMeter, pixel_accuracy  # noqa: F401
from ubresnet_tpu.train.schedules import make_schedule  # noqa: F401
from ubresnet_tpu.train.optimizers import make_optimizer  # noqa: F401
from ubresnet_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    latest_step,
)
