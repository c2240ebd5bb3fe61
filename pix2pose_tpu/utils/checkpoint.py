"""Checkpoint / resume with the reference's two-tier scheme.

The reference saves per-epoch generator+discriminator HDF5 snapshots named
``pix2pose.{epoch:02d}_{gen|disc}_{ratio}-{loss:.4f}.hdf5`` and resumes from
the latest by filename scan (``tools/3_train_pix2pose.py:139-167,247-250``);
deployment uses a separate generator-only ``inference.hdf5`` export
(``3_train:271-277``, rebuilt by ``tools/4_convert_weights_inference.py``).

Here: orbax checkpoints of the full GAN train state per epoch (auto-resume
from the latest step), plus a generator-only inference export. The HDF5
import shim for reference-trained weights lives in
``pix2pose_tpu.utils.hdf5_import``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_train_state(ckpt_dir: str, state, epoch: int):
    """Per-epoch full train-state snapshot (gen+disc params, BN stats,
    optimizer moments)."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{epoch:04d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_epoch(ckpt_dir: str) -> int:
    """Find the newest epoch snapshot (filename scan, like the reference's
    resume logic at ``3_train:139-167``). Returns -1 when none."""
    if not os.path.isdir(ckpt_dir):
        return -1
    best = -1
    for name in os.listdir(ckpt_dir):
        if name.startswith("epoch_"):
            try:
                best = max(best, int(name.split("_")[1]))
            except (IndexError, ValueError):
                continue
    return best


def restore_train_state(ckpt_dir: str, template, epoch: int | None = None):
    """Restore the given (or latest) epoch snapshot into ``template``'s
    structure. Returns (state, epoch) or (None, -1).

    The no-checkpoint fast path touches no device buffers (a device_get
    here would flip the axon relay into its slow per-launch mode for the
    whole process; see docs/SCALING.md)."""
    e = latest_epoch(ckpt_dir) if epoch is None else epoch
    if e < 0:
        return None, -1
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{e:04d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path, item=jax.device_get(template))
    return state, e


def export_inference(ckpt_dir: str, gen_params, gen_stats):
    """Generator-only deployment artifact (the reference's
    ``inference.hdf5`` equivalent, ``3_train:271-277``)."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), "inference")
    payload = {"params": jax.device_get(gen_params),
               "batch_stats": jax.device_get(gen_stats)}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def load_inference_params(weight_dir: str, model=None) -> Any | None:
    """Load a deployment artifact: orbax ``inference/`` dir, else a
    reference Keras ``inference.hdf5`` via the import shim. Returns model
    variables ({'params', 'batch_stats'}) or None."""
    orbax_path = os.path.join(os.path.abspath(weight_dir), "inference")
    if os.path.isdir(orbax_path):
        ocp = _ocp()
        with ocp.PyTreeCheckpointer() as ckptr:
            payload = ckptr.restore(orbax_path)
        return {"params": payload["params"],
                "batch_stats": payload.get("batch_stats", {})}
    for h5name in ("inference.hdf5", "inference_resnet_model.hdf5",
                   "inference_resnet50.hdf5"):
        h5 = os.path.join(weight_dir, h5name)
        if os.path.exists(h5):
            from pix2pose_tpu.utils import hdf5_import
            loader = (hdf5_import.load_keras_generator_resnet50
                      if "resnet" in h5name
                      else hdf5_import.load_keras_generator)
            return loader(h5, model)
    return None
