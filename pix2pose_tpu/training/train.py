"""Per-object GAN training driver.

CLI mirror of ``python3 tools/3_train_pix2pose.py <gpu> <cfg> <dataset>
<obj_id> <background_dir>`` (device selection is JAX-native):

    python -m pix2pose_tpu.training.train <cfg.json> <dataset> <obj_id> \
        <background_dir> [--epochs N] [--batch B]

Reference semantics preserved: symmetry pool from models_info
(``3_train:96-111``), epoch = min(n_data/batch*10, 3000) batches
(``3_train:191``), BOP lr schedule (``3_train:169-173``), per-epoch
checkpoints with auto-resume (``3_train:139-167,247-250``), per-epoch
validation montage (``3_train:252-264``), final generator-only inference
export (``3_train:271-277``).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.config import TrainConfig, load_eval_config
from pix2pose_tpu.data.bop import BopDataset
from pix2pose_tpu.models import AutoEncoder, Discriminator
from pix2pose_tpu.training.data import PatchStore, make_batch
from pix2pose_tpu.training.gan import create_train_state, make_train_step
from pix2pose_tpu.utils import checkpoint as ckpt


def save_val_montage(path, src, tgt, gen, n: int = 10):
    """(input | GT xyz | prediction) grid png (``3_train:252-264``)."""
    from PIL import Image

    n = min(n, src.shape[0])
    rows = []
    for i in range(n):
        row = np.concatenate([
            np.asarray((src[i] + 1) / 2), np.asarray((tgt[i] + 1) / 2),
            np.asarray((gen[i] + 1) / 2)], axis=1)
        rows.append(row)
    img = (np.clip(np.concatenate(rows, axis=0), 0, 1) * 255).astype(
        np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img).save(path)


def train_object(dataset: BopDataset, obj_id: int, back_dir: str,
                 cfg: TrainConfig = TrainConfig(),
                 weight_root: str | None = None,
                 data_dir: str | None = None,
                 log_every: int = 10, max_steps: int | None = None,
                 imagenet_h5: str | None = None):
    """Train one object's generator; returns the final train state.

    ``imagenet_h5``: path to the keras-applications notop ResNet-50
    ImageNet file; with the resnet50 backbone a FRESH run initializes the
    encoder trunk from it (the reference's pretrained init,
    ``resnet50_mod.py:246-258``). Ignored when resuming from a checkpoint.
    """
    weight_root = weight_root or os.path.join(dataset.dir,
                                              "pix2pose_weights")
    weight_dir = os.path.join(weight_root, f"{obj_id:02d}")
    data_dir = data_dir or os.path.join(dataset.dir, "train_xyz",
                                        f"{obj_id:02d}")
    store = PatchStore.load(data_dir, back_dir)
    print(f"obj {obj_id}: {store.n_data} training views")
    # rotation_lock set by the training-pair renderer for continuous-sym
    # objects with camera-parallel axis (reference ``2_2:46-50``)
    full_rot = True
    meta_fn = os.path.join(data_dir, "meta.json")
    if os.path.exists(meta_fn):
        import json
        with open(meta_fn) as f:
            full_rot = not json.load(f).get("rotation_lock", False)

    from pix2pose_tpu.utils.symmetry import training_sym_pool
    sym_pool = jnp.asarray(training_sym_pool(dataset, obj_id))
    gen = AutoEncoder(backbone=cfg.backbone, dtype=cfg.jnp_dtype)
    disc = Discriminator(dtype=cfg.jnp_dtype)
    state = create_train_state(jax.random.PRNGKey(obj_id), gen, disc, cfg)
    state, epoch = _maybe_resume(weight_dir, state)
    if imagenet_h5 and epoch == 0:
        if cfg.backbone != "resnet50":
            raise ValueError("--imagenet-h5 requires backbone=resnet50")
        from pix2pose_tpu.utils.hdf5_import import \
            init_generator_trunk_from_imagenet
        gv = init_generator_trunk_from_imagenet(
            {"params": state.gen_params, "batch_stats": state.gen_stats},
            imagenet_h5)
        state = state._replace(gen_params=gv["params"],
                               gen_stats=gv["batch_stats"])
        print(f"initialized resnet50 trunk from {imagenet_h5}")
    raw_step = make_train_step(gen, disc, cfg)

    # batch synthesis fused into the step: one program per iteration
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, store, step_idx, lr, key):
        kb, ks = jax.random.split(key)
        batch = make_batch(store, kb, step_idx, cfg.batch_size,
                           full_rotation=full_rot)
        return raw_step(state, batch, sym_pool, lr, ks)

    n_batch = cfg.batches_per_epoch(store.n_data)
    key = jax.random.PRNGKey(1234 + obj_id)
    total_steps = 0
    while epoch < cfg.max_epoch:
        lr = cfg.lr_schedule[min(epoch, len(cfg.lr_schedule) - 1)]
        recon_hist = []
        t0 = time.time()
        # metric fetches are deferred to epoch end: a mid-loop device_get
        # flips the axon relay into its slow per-launch mode
        # (docs/SCALING.md logging-hygiene note)
        pending = []
        for it in range(n_batch):
            key, ks = jax.random.split(key)
            state, metrics = step_fn(state, store, total_steps, lr, ks)
            total_steps += 1
            if (it + 1) % log_every == 0:
                pending.append((it, metrics))
            if (it + 1) % 100 == 0:
                # periodic sync (not a value fetch) to cap the async
                # dispatch queue — deep pipelines can wedge the axon relay
                jax.block_until_ready(metrics["recon_loss"])
            if max_steps is not None and total_steps >= max_steps:
                break
        for it, m in [(i, jax.device_get(p)) for i, p in pending]:
            recon_hist.append(float(m["recon_loss"]))
            print(f"E{epoch:02d} it{it:04d}/{n_batch} "
                  f"recon={m['recon_loss']:.4f} "
                  f"disc={m['disc_loss']:.4f} "
                  f"gen={m['gen_adv_loss']:.4f} lr={lr:g}")
        epoch += 1
        ckpt.save_train_state(weight_dir, state, epoch)
        # validation montage
        key, kb = jax.random.split(key)
        vb = make_batch(store, kb, 1, cfg.batch_size)
        gen_img, _ = gen.apply({"params": state.gen_params,
                                "batch_stats": state.gen_stats}, vb["src"])
        save_val_montage(os.path.join(weight_dir, "val_img",
                                      f"epoch_{epoch:02d}.png"),
                         vb["src"], vb["tgt"], gen_img)
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s "
              f"mean_recon={np.mean(recon_hist or [np.nan]):.4f}")
        if max_steps is not None and total_steps >= max_steps:
            break

    ckpt.export_inference(weight_dir, state.gen_params, state.gen_stats)
    print(f"exported inference params to {weight_dir}/inference")
    return state


def _maybe_resume(weight_dir, state):
    restored, epoch = ckpt.restore_train_state(weight_dir, state)
    if restored is None:
        return state, 0
    print(f"resumed from epoch {epoch}")
    return restored, epoch


def main(argv: Sequence[str] | None = None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("obj_id", type=int)
    p.add_argument("back_dir")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--imagenet-h5", default=None,
                   help="keras-applications notop resnet50 h5: pretrained "
                        "trunk init for fresh resnet50-backbone runs "
                        "(reference resnet50_mod.py:246-258)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="conv compute dtype (mixed precision; params fp32)")
    args = p.parse_args(argv)

    ecfg = load_eval_config(args.cfg)
    ds = BopDataset(ecfg.dataset_dir, args.dataset, train=True)
    kw = {"backbone": ecfg.backbone, "compute_dtype": args.dtype}
    if args.epochs:
        kw.update(max_epoch=args.epochs, batch_size=args.batch or 50)
    elif args.batch:
        kw.update(batch_size=args.batch)
    tcfg = TrainConfig(**kw)
    train_object(ds, args.obj_id, args.back_dir, tcfg,
                 max_steps=args.max_steps, imagenet_h5=args.imagenet_h5)


if __name__ == "__main__":
    main()
