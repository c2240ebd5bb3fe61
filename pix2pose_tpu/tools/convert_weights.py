"""Weight converter — reference ``tools/4_convert_weights_inference.py``.

Recovers a generator-only deployment artifact from training state:
- orbax epoch checkpoints (our trainer) -> ``inference/`` export, or
- reference Keras training/inference HDF5 -> orbax ``inference/`` export
  (so reference-trained weights run on TPU via one conversion).

CLI: python -m pix2pose_tpu.tools.convert_weights <weight_dir>
         [--backbone paper]
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp


def convert(weight_dir: str, backbone: str = "paper") -> str:
    from pix2pose_tpu.config import TrainConfig
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.training.gan import create_train_state
    from pix2pose_tpu.utils import checkpoint as ckpt

    gen = AutoEncoder(backbone=backbone)
    # 1) orbax training checkpoints (latest epoch scan, like the
    #    reference's filename scan at 4_convert:21-38)
    if ckpt.latest_epoch(weight_dir) >= 0:
        disc = Discriminator()
        template = create_train_state(jax.random.PRNGKey(0), gen, disc,
                                      TrainConfig(backbone=backbone))
        state, epoch = ckpt.restore_train_state(weight_dir, template)
        path = ckpt.export_inference(weight_dir, state.gen_params,
                                     state.gen_stats)
        print(f"exported inference params from epoch {epoch} -> {path}")
        return path
    # 2) keras hdf5
    for name in ("inference.hdf5", "inference_resnet_model.hdf5"):
        h5 = os.path.join(weight_dir, name)
        if os.path.exists(h5):
            from pix2pose_tpu.utils.hdf5_import import load_keras_generator

            variables = load_keras_generator(h5, gen)
            path = ckpt.export_inference(weight_dir, variables["params"],
                                         variables["batch_stats"])
            print(f"converted {h5} -> {path}")
            return path
    raise SystemExit(f"no training checkpoints or hdf5 in {weight_dir}")


def main(argv: Sequence[str] | None = None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("weight_dir")
    p.add_argument("--backbone", default="paper")
    args = p.parse_args(argv)
    convert(args.weight_dir, args.backbone)


if __name__ == "__main__":
    main()
