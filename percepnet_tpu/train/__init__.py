from percepnet_tpu.train.loss import percepnet_loss  # noqa: F401
from percepnet_tpu.train.state import (  # noqa: F401
    TrainState, init_train_state, make_optimizer, make_jitted_steps,
    train_step, eval_step,
)
from percepnet_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
