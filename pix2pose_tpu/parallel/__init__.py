"""Device-mesh parallelism: data-parallel GAN steps and object-parallel
multi-model training over ICI."""

from pix2pose_tpu.parallel.mesh import (  # noqa: F401
    host_local_to_global,
    init_distributed,
    make_mesh,
    make_parallel_train_step,
    process_slice,
    replicate,
    shard_batch,
    shard_inference_inputs,
)
