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
                                                 make_detector_batch,
                                                 pack_detector_batch,
                                                 unpack_detector_batch)
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


def make_pooled_detector_step(model: CenterNetDetector, pool_size: int,
                              batch_size: int, im_size: int,
                              fresh_per_step: int = 4, k_obj: int = 8,
                              stride: int = 4,
                              scale_range: tuple = (0.6, 1.6),
                              refresh_every: int = 4):
    """Scene-pool training: compose a few scenes per step into a device-
    side ring buffer and train on a random contiguous window of it.

    The reference composes its detector dataset OFFLINE (200k scenes,
    ``1_1_scene_gen_for_detection_maskrcnn.py``) and trains Mask-RCNN
    over it for many epochs — every scene is reused dozens of times.
    The fused fresh-compose step re-synthesizes every scene it trains
    on, which is MORE diversity than the reference but leaves the step
    composer-bound (the composer is ~0.4% MFU by construction: warps
    and splats, no big matmuls). The pool regime restores the
    reference's amortization as one jitted program — no host round
    trips, no second program to interleave (axon relay pathology):

      refresh: pool[(it*F) % P : +F] <- F freshly composed scenes
      train:   batch = pool[r : r+B] for random r  (contiguous slice --
               a gather-free pick; window contents span pool ages)

    Expected scene reuse = P/F trainings per scene (default 256/4 = 64
    lifetime steps x B/P sampling = 8 expected trainings), far below
    the reference's per-scene epoch count. Gate any default flip with an
    equal-steps mAP A/B (``examples/detector_map5.py --pool``); measured
    status in docs/PARITY.md.

    Two cost levers beyond the ring buffer itself (both gated
    mAP-neutral at equal steps, docs/PARITY.md "Detector train steps"):
    the pool holds scenes in the compact encoding of
    :func:`~pix2pose_tpu.training.detector_data.pack_detector_batch`
    (uint8 images / bf16 targets — 3.6x less HBM on the update+slice),
    and ``refresh_every`` amortizes the composer's per-launch fixed
    costs by composing ``fresh_per_step * refresh_every`` scenes on
    every ``refresh_every``-th step under a ``lax.cond`` (same expected
    refresh rate and scene reuse; one jitted program either way).

    Returns ``(init_pool, step_fn)``:
      pool = init_pool(store, key)                       # once
      state, pool, parts = step_fn(state, store, pool, it, key, lr)
    ``step_fn`` donates state and pool (in-place ring update)."""
    chunk = fresh_per_step * refresh_every
    if pool_size % chunk or pool_size < batch_size:
        raise ValueError("pool_size must be a multiple of fresh_per_step"
                         " * refresh_every and >= batch_size")
    raw_step = make_detector_step(model)

    def compose(store, key, n):
        return pack_detector_batch(make_detector_batch(
            store, key, n, im_size, k_obj=k_obj, stride=stride,
            scale_range=scale_range))

    def init_pool(store, key):
        chunks = []
        for k in jax.random.split(key, pool_size // chunk):
            chunks.append(compose(store, k, chunk))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks)

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step_fn(state, store, pool, it, key, lr):
        kf, kb = jax.random.split(key)

        def refresh(pool):
            fresh = compose(store, kf, chunk)
            off = ((it // refresh_every) * chunk) % pool_size
            return jax.tree_util.tree_map(
                lambda p, f: jax.lax.dynamic_update_slice_in_dim(
                    p, f, off, axis=0), pool, fresh)

        pool = jax.lax.cond(it % refresh_every == 0, refresh,
                            lambda p: p, pool)
        start = jax.random.randint(kb, (), 0,
                                   pool_size - batch_size + 1)
        batch = unpack_detector_batch(jax.tree_util.tree_map(
            lambda p: jax.lax.dynamic_slice_in_dim(
                p, start, batch_size, axis=0), pool))
        new_state, parts = raw_step(state, batch, lr)
        return new_state, pool, parts

    return init_pool, step_fn


def train_detector(store: DetectorStore, steps: int = 2000,
                   batch_size: int = 4, im_size: int = 512,
                   lr: float = 2.5e-4, ckpt_dir: str | None = None,
                   log_every: int = 20, seed: int = 0,
                   save_every: int = 1000, pool_size: int | None = None,
                   fresh_per_step: int = 4):
    """``pool_size`` switches to the scene-pool regime (see
    :func:`make_pooled_detector_step`): the composer amortizes over
    ``pool_size / fresh_per_step`` steps instead of running fully every
    step — the fresh-compose step is composer-bound at larger batches."""
    model = CenterNetDetector(num_classes=store.num_classes)
    state = create_detector_state(jax.random.PRNGKey(seed), model, im_size)
    if ckpt_dir:
        restored, ep = ckpt.restore_train_state(ckpt_dir, state)
        if restored is not None:
            state = restored
            print(f"resumed detector from checkpoint {ep}")
    raw_step = make_detector_step(model)

    pool = None
    if pool_size:
        init_pool, pooled_fn = make_pooled_detector_step(
            model, pool_size, batch_size, im_size,
            fresh_per_step=fresh_per_step)
        pool = init_pool(store, jax.random.PRNGKey(seed + 2))

        def step_fn(state, store, key, cur_lr, _it=[0]):
            nonlocal pool
            state, pool, parts = pooled_fn(state, store, pool,
                                           jnp.int32(_it[0]), key, cur_lr)
            _it[0] += 1
            return state, parts
    else:
        # scene synthesis fused into the step: ONE program dispatch per
        # iteration (also sidesteps the axon multi-program interleave
        # stall — see .claude/skills/verify/SKILL.md)
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
