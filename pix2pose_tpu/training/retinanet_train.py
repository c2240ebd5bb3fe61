"""RetinaNet training driver (the alternative anchor-head detector; the
reference trains fizyr keras-retinanet externally for its T-Less results,
``5_evaluation_bop_basic.py:64-97``).

Same on-device scene composer as the CenterNet driver — the anchor
targets are assigned inside the jitted step from the composer's exact
full-resolution GT boxes, so scene synthesis + assignment + forward +
backward is ONE device program per iteration.

CLI: python -m pix2pose_tpu.training.retinanet_train <cfg.json> <dataset>
         <background_dir> [--steps N]
"""

from __future__ import annotations

import functools
import os
import time
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pix2pose_tpu.models.retinanet import (RetinaNetDetector,
                                           anchor_boxes, retinanet_loss)
from pix2pose_tpu.training.detector_data import (DetectorStore,
                                                 make_detector_batch)
from pix2pose_tpu.training.detector_train import DetTrainState
from pix2pose_tpu.utils import checkpoint as ckpt


def create_retinanet_state(rng, model: RetinaNetDetector,
                           im_size: int = 512) -> DetTrainState:
    v = model.init(rng, jnp.zeros((1, im_size, im_size, 3)))
    tx = optax.scale_by_adam()
    return DetTrainState(params=v["params"],
                         stats=v.get("batch_stats", {}),
                         opt=tx.init(v["params"]),
                         step=jnp.zeros((), jnp.int32))


def make_retinanet_step(model: RetinaNetDetector, anchors,
                        pos_iou: float = 0.5, neg_iou: float = 0.4):
    tx = optax.scale_by_adam()
    anchors = jnp.asarray(anchors)

    def step(state: DetTrainState, batch, lr):
        def loss_fn(p):
            out, new = model.apply(
                {"params": p, "batch_stats": state.stats},
                batch["image"], train=True, mutable=["batch_stats"])
            total, parts = retinanet_loss(
                out, anchors, batch["gt_bbox"], batch["gt_cls"],
                batch["gt_valid"], model.num_classes,
                pos_iou=pos_iou, neg_iou=neg_iou)
            return total, (new["batch_stats"], parts)

        (total, (stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        parts["total"] = total
        return DetTrainState(params, stats, opt, state.step + 1), parts

    return step


def train_retinanet(store: DetectorStore, steps: int = 2000,
                    batch_size: int = 4, im_size: int = 512,
                    lr: float = 1e-4, ckpt_dir: str | None = None,
                    log_every: int = 50, seed: int = 0,
                    save_every: int = 1000, trunk: str = "resnet50",
                    anchor_base: float = 4.0):
    model = RetinaNetDetector(num_classes=store.num_classes, trunk=trunk)
    anchors = anchor_boxes(im_size, base=anchor_base)
    state = create_retinanet_state(jax.random.PRNGKey(seed), model,
                                   im_size)
    if ckpt_dir:
        restored, ep = ckpt.restore_train_state(ckpt_dir, state)
        if restored is not None:
            state = restored
            print(f"resumed retinanet from checkpoint {ep}")
    raw_step = make_retinanet_step(model, anchors)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, store, key, cur_lr):
        batch = make_detector_batch(store, key, batch_size, im_size)
        return raw_step(state, batch, cur_lr)

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    history = []
    for it in range(steps):
        key, kb = jax.random.split(key)
        cur_lr = lr * min(1.0, (it + 1) / 200)
        state, parts = step_fn(state, store, kb, cur_lr)
        if (it + 1) % log_every == 0:
            history.append((it, parts))
        if (it + 1) % 100 == 0:
            jax.block_until_ready(parts["total"])  # cap dispatch queue
        if ckpt_dir and it > 0 and it % save_every == 0:
            ckpt.save_train_state(ckpt_dir, state, it // save_every)
    if steps:  # ``parts`` only exists after at least one step
        history.append((steps - 1, parts))
    for it, m in [(i, jax.device_get(p)) for i, p in history]:
        print(f"it{it:05d} total={m['total']:.4f} cls={m['cls']:.4f} "
              f"box={m['box']:.4f}")
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
    p.add_argument("--anchor-base", type=float, default=4.0,
                   help="anchor level size = base * stride; drop toward "
                   "3.0 when the scene's small-object tail falls under "
                   "the base*stride_min anchor (measured +0.12 mAP50 on "
                   "the synthetic 5-class bench)")
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
    ckpt_dir = os.path.join(ds.dir, "weight_detection", "retinanet")
    train_retinanet(store, steps=args.steps, batch_size=args.batch,
                    ckpt_dir=ckpt_dir, anchor_base=args.anchor_base)


if __name__ == "__main__":
    main()
