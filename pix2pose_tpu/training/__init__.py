"""GAN training: jitted per-object train step, lr schedule, checkpointing,
and object-parallel scale-out over a device mesh."""

from pix2pose_tpu.training.gan import (  # noqa: F401
    GanTrainState,
    create_train_state,
    make_train_step,
)
from pix2pose_tpu.training.multi import (  # noqa: F401
    make_multi_step,
    stack_states,
    stack_stores,
    stack_sym_pools,
    train_objects,
    unstack_state,
)
