"""GAN training: jitted per-object train step, lr schedule, checkpointing,
and object-parallel scale-out over a device mesh."""

from pix2pose_tpu.training.gan import (  # noqa: F401
    GanTrainState,
    create_train_state,
    make_train_step,
)
