from pcdms_tpu.train.common import (
    TrainConfig, make_optimizer, init_train_state, make_train_step,
)
from pcdms_tpu.train.stage1 import stage1_loss_fn
from pcdms_tpu.train.stage2 import stage2_loss_fn
from pcdms_tpu.train.stage3 import stage3_loss_fn
