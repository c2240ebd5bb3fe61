"""Device-mesh parallelism: data-parallel GAN steps and object-parallel
multi-model training over ICI."""

from pix2pose_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    make_parallel_train_step,
)
