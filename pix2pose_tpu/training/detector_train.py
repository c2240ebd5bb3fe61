"""Detector training driver (replaces the reference's Mask-RCNN trainer
shim, ``tools/1_2_train_maskrcnn.py``): adam step on the CenterNet losses
over on-device synthesized scenes, with orbax checkpoints.

CLI: python -m pix2pose_tpu.training.detector_train <cfg.json> <dataset>
         <background_dir> [--steps N]
"""

from __future__ import annotations

import functools
import os
import time
from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pix2pose_tpu.models.detector import CenterNetDetector, detector_loss
from pix2pose_tpu.training.detector_data import (DetectorStore,
                                                 make_detector_batch)
from pix2pose_tpu.utils import checkpoint as ckpt


class DetTrainState(NamedTuple):
    params: dict
    stats: dict
    opt: tuple
    step: jnp.ndarray


def create_detector_state(rng, model: CenterNetDetector,
                          im_size: int = 512) -> DetTrainState:
    v = model.init(rng, jnp.zeros((1, im_size, im_size, 3)))
    tx = optax.scale_by_adam()
    return DetTrainState(params=v["params"],
                         stats=v.get("batch_stats", {}),
                         opt=tx.init(v["params"]),
                         step=jnp.zeros((), jnp.int32))


def make_detector_step(model: CenterNetDetector):
    tx = optax.scale_by_adam()

    def step(state: DetTrainState, batch, lr):
        def loss_fn(p):
            out, new = model.apply(
                {"params": p, "batch_stats": state.stats},
                batch["image"], train=True, mutable=["batch_stats"])
            total, parts = detector_loss(out, batch)
            return total, (new["batch_stats"], parts)

        (total, (stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        parts["total"] = total
        return DetTrainState(params, stats, opt, state.step + 1), parts

    return step


def train_detector(store: DetectorStore, steps: int = 2000,
                   batch_size: int = 4, im_size: int = 512,
                   lr: float = 2.5e-4, ckpt_dir: str | None = None,
                   log_every: int = 20, seed: int = 0,
                   save_every: int = 1000):
    model = CenterNetDetector(num_classes=store.num_classes)
    state = create_detector_state(jax.random.PRNGKey(seed), model, im_size)
    if ckpt_dir:
        restored, ep = ckpt.restore_train_state(ckpt_dir, state)
        if restored is not None:
            state = restored
            print(f"resumed detector from checkpoint {ep}")
    raw_step = make_detector_step(model)

    # scene synthesis fused into the step: ONE program dispatch per
    # iteration (also sidesteps the axon multi-program interleave stall —
    # see .claude/skills/verify/SKILL.md)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, store, key, cur_lr):
        batch = make_detector_batch(store, key, batch_size, im_size)
        return raw_step(state, batch, cur_lr)

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    # Logging hygiene: metric values are kept on device and fetched ONCE at
    # the end — any mid-loop device_get flips the axon relay into a slow
    # per-launch mode for the rest of the process (docs/SCALING.md).
    history = []
    for it in range(steps):
        key, kb = jax.random.split(key)
        cur_lr = lr * min(1.0, (it + 1) / 200)  # warmup
        state, parts = step_fn(state, store, kb, cur_lr)
        if (it + 1) % log_every == 0:
            history.append((it, parts))
            print(f"it{it:05d} dispatched ({time.time() - t0:.1f}s)")
        if (it + 1) % 100 == 0:
            # periodic sync (NOT a value fetch): caps the async dispatch
            # queue, which can wedge the axon relay when thousands of
            # launches pile up
            jax.block_until_ready(parts["total"])
        if ckpt_dir and it > 0 and it % save_every == 0:
            ckpt.save_train_state(ckpt_dir, state, it // save_every)
    if steps:  # ``parts`` only exists after at least one step
        history.append((steps - 1, parts))
    for it, m in [(i, jax.device_get(p)) for i, p in history]:
        print(f"it{it:05d} total={m['total']:.4f} heat={m['heat']:.4f} "
              f"wh={m['wh']:.4f} seg={m['seg']:.4f}")
    print(f"{steps} steps in {time.time() - t0:.1f}s")
    if ckpt_dir:
        if steps:  # resumable final state, not only the inference export
            ckpt.save_train_state(ckpt_dir, state,
                                  max(steps - 1, 1) // save_every + 1)
        ckpt.export_inference(ckpt_dir, state.params, state.stats)
    return model, {"params": state.params, "batch_stats": state.stats}


def main(argv: Sequence[str] | None = None):
    import argparse

    from pix2pose_tpu.config import load_eval_config
    from pix2pose_tpu.data.bop import BopDataset
    from pix2pose_tpu.training.data import PatchStore

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("back_dir")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args(argv)

    ecfg = load_eval_config(args.cfg)
    ds = BopDataset(ecfg.dataset_dir, args.dataset, train=True)
    stores = {}
    for obj_id in ds.model_ids:
        d = os.path.join(ds.dir, "train_xyz", f"{obj_id:02d}")
        if os.path.isdir(d):
            stores[obj_id] = PatchStore.load(d, args.back_dir)
    if not stores:
        raise SystemExit("no train_xyz data found — run "
                         "render_training_pairs first")
    backs = stores[next(iter(stores))].backs
    store = DetectorStore.from_patch_stores(stores, backs)
    ckpt_dir = os.path.join(ds.dir, "weight_detection", "centernet")
    train_detector(store, steps=args.steps, batch_size=args.batch,
                   ckpt_dir=ckpt_dir)


if __name__ == "__main__":
    main()
