"""Fused multi-object GAN training on ONE chip.

Pix2Pose trains one small network PER OBJECT; the reference scales out by
launching 20+ sequential single-GPU jobs (``train.sh:1-21``, one
``3_train_pix2pose.py`` invocation per object). Each network is tiny for a
TPU — a 50-sample 128x128 batch leaves the MXU under-occupied — so the
TPU-native replacement is to FUSE: stack K objects' train states, patch
stores and symmetry pools on a leading axis and vmap the whole iteration
(batch synthesis + disc x2 + gen updates, ``training/gan.py``) into one
jitted program. XLA batches the K small matmuls/convs into K-wide ones,
recovering MXU occupancy; one launch trains K objects.

This is the single-chip sibling of ``parallel/mesh.py``'s ``obj`` axis
(which shards the same stacked structure across a mesh); both replace
``train.sh``. Per-object differences are carried as traced data, never as
K programs:

- store sizes: stores are tile-padded to a common N and sampling bounds
  come from a per-object ``n_valid`` vector (``data.py:_make_batch``);
- symmetry pools: padded to a common n_sym by repeating entry 0 — the
  transformer loss takes an argmin over the pool (``models/losses.py``),
  so duplicate candidates are exact no-ops;
- rotation locks: per-object ``full_rotation`` flags feed the traced
  angle ``jnp.where`` in ``data.py:_one_sample`` (reference ``2_2:46-50``).

Checkpoints stay per-object (same layout as ``training/train.py``), so a
fused run can be resumed object-by-object by the single-object trainer and
vice versa.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.config import TrainConfig
from pix2pose_tpu.data.bop import BopDataset
from pix2pose_tpu.models import AutoEncoder, Discriminator
from pix2pose_tpu.training.data import PatchStore, _make_batch
from pix2pose_tpu.training.gan import create_train_state, make_train_step
from pix2pose_tpu.training.train import save_val_montage
from pix2pose_tpu.utils import checkpoint as ckpt


def _tile_pad(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad the leading axis to ``n`` by tiling — padding rows are real
    samples, so even an out-of-bound index yields valid data."""
    if arr.shape[0] == n:
        return arr
    reps = -(-n // arr.shape[0])
    return np.concatenate([arr] * reps, axis=0)[:n]


def stack_stores(stores: Sequence[PatchStore]):
    """Stack K per-object :class:`PatchStore`\\ s into one leading-axis
    store + a ``(K,)`` int32 ``n_valid`` vector of true store sizes."""
    n = max(s.n_data for s in stores)
    m = max(s.backs.shape[0] for s in stores)
    host = [jax.device_get((s.rgb, s.xyz, s.mask, s.extent, s.backs))
            for s in stores]
    stacked = PatchStore(
        rgb=jnp.asarray(np.stack([_tile_pad(h[0], n) for h in host])),
        xyz=jnp.asarray(np.stack([_tile_pad(h[1], n) for h in host])),
        mask=jnp.asarray(np.stack([_tile_pad(h[2], n) for h in host])),
        extent=jnp.asarray(np.stack([_tile_pad(h[3], n) for h in host])),
        backs=jnp.asarray(np.stack([_tile_pad(h[4], m) for h in host])))
    n_valid = jnp.asarray([s.n_data for s in stores], jnp.int32)
    return stacked, n_valid


def stack_sym_pools(pools: Sequence[np.ndarray]) -> jnp.ndarray:
    """Pad per-object ``(n_sym,3,3)`` pools to a common size by repeating
    entry 0 (argmin-safe, see module docstring) and stack to ``(K,S,3,3)``."""
    s = max(p.shape[0] for p in pools)
    out = [np.concatenate([p] + [p[:1]] * (s - p.shape[0]), axis=0)
           if p.shape[0] < s else p for p in pools]
    return jnp.asarray(np.stack(out))


def stack_states(states):
    """Stack K train states leaf-wise onto a leading object axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(stacked, k: int):
    """Slice object ``k``'s train state back out of the stack."""
    return jax.tree_util.tree_map(lambda x: x[k], stacked)


def make_multi_step(gen, disc, cfg: TrainConfig):
    """One fused iteration for K objects.

    ``step(states, store, n_valid, full_rot, sym_pools, step_idx, lr, keys)
    -> (states, metrics)`` — every argument except ``step_idx``/``lr``
    carries a leading K axis; metrics come back ``(K,)`` per entry.
    """
    raw_step = make_train_step(gen, disc, cfg)

    def one(state, store, n_valid, full_rot, sym_pool, step_idx, lr, key):
        kb, ks = jax.random.split(key)
        batch = _make_batch(store, kb, step_idx, cfg.batch_size,
                            full_rotation=full_rot, n_valid=n_valid)
        return raw_step(state, batch, sym_pool, lr, ks)

    vstep = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, None, None, 0))
    return jax.jit(vstep, donate_argnums=(0,))


def train_objects(dataset: BopDataset, obj_ids: Sequence[int],
                  back_dir: str, cfg: TrainConfig = TrainConfig(),
                  weight_root: str | None = None,
                  data_root: str | None = None,
                  log_every: int = 10, max_steps: int | None = None,
                  imagenet_h5: str | None = None):
    """Train K objects' generators in one fused program; returns the final
    stacked train state. Reference semantics per object match
    ``training/train.py`` (epoch rule, lr schedule, per-epoch checkpoints
    with auto-resume, montage, inference export) — the epoch length is the
    max of the per-object rules so no object trains below its reference
    budget (``3_train:191``)."""
    weight_root = weight_root or os.path.join(dataset.dir,
                                              "pix2pose_weights")
    stores, full_rots, pools, states, epochs = [], [], [], [], []
    gen = AutoEncoder(backbone=cfg.backbone, dtype=cfg.jnp_dtype)
    disc = Discriminator(dtype=cfg.jnp_dtype)
    for obj_id in obj_ids:
        data_dir = (os.path.join(data_root, f"{obj_id:02d}") if data_root
                    else os.path.join(dataset.dir, "train_xyz",
                                      f"{obj_id:02d}"))
        store = PatchStore.load(data_dir, back_dir)
        print(f"obj {obj_id}: {store.n_data} training views")
        full_rot = True
        meta_fn = os.path.join(data_dir, "meta.json")
        if os.path.exists(meta_fn):
            import json
            with open(meta_fn) as f:
                full_rot = not json.load(f).get("rotation_lock", False)
        stores.append(store)
        full_rots.append(full_rot)
        from pix2pose_tpu.utils.symmetry import training_sym_pool
        pools.append(np.asarray(training_sym_pool(dataset, obj_id)))
        state = create_train_state(jax.random.PRNGKey(obj_id), gen, disc,
                                   cfg)
        wdir = os.path.join(weight_root, f"{obj_id:02d}")
        restored, ep = ckpt.restore_train_state(wdir, state)
        if restored is not None:
            print(f"obj {obj_id}: resumed from epoch {ep}")
            state, epoch = restored, ep
        else:
            epoch = 0
            if imagenet_h5:
                if cfg.backbone != "resnet50":
                    raise ValueError("--imagenet-h5 requires "
                                     "backbone=resnet50")
                from pix2pose_tpu.utils.hdf5_import import \
                    init_generator_trunk_from_imagenet
                gv = init_generator_trunk_from_imagenet(
                    {"params": state.gen_params,
                     "batch_stats": state.gen_stats}, imagenet_h5)
                state = state._replace(gen_params=gv["params"],
                                       gen_stats=gv["batch_stats"])
        states.append(state)
        epochs.append(epoch)
    if len(set(epochs)) != 1:
        print(f"WARNING: resume epochs differ per object ({epochs}); "
              f"training all from min = {min(epochs)}")
    epoch = min(epochs)

    stacked_store, n_valid = stack_stores(stores)
    sym_pools = stack_sym_pools(pools)
    full_rot_v = jnp.asarray(full_rots)
    stacked = stack_states(states)
    step_fn = make_multi_step(gen, disc, cfg)

    n_batch = max(cfg.batches_per_epoch(s.n_data) for s in stores)
    key = jax.random.PRNGKey(1234)
    total_steps = 0
    k_obj = len(obj_ids)
    while epoch < cfg.max_epoch:
        lr = cfg.lr_schedule[min(epoch, len(cfg.lr_schedule) - 1)]
        t0 = time.time()
        pending = []
        for it in range(n_batch):
            key, ks = jax.random.split(key)
            keys = jax.random.split(ks, k_obj)
            stacked, metrics = step_fn(stacked, stacked_store, n_valid,
                                       full_rot_v, sym_pools, total_steps,
                                       lr, keys)
            total_steps += 1
            if (it + 1) % log_every == 0:
                pending.append((it, metrics))
            if (it + 1) % 100 == 0:
                # periodic sync caps the axon dispatch queue (CLAUDE.md)
                jax.block_until_ready(metrics["recon_loss"])
            if max_steps is not None and total_steps >= max_steps:
                break
        for it, m in [(i, jax.device_get(p)) for i, p in pending]:
            recon = " ".join(f"{v:.4f}" for v in m["recon_loss"])
            print(f"E{epoch:02d} it{it:04d}/{n_batch} recon=[{recon}] "
                  f"lr={lr:g}")
        epoch += 1
        _save_epoch(weight_root, obj_ids, gen, stacked, stacked_store,
                    n_valid, full_rot_v, epoch, cfg, key)
        print(f"epoch {epoch} ({k_obj} objects) done in "
              f"{time.time() - t0:.1f}s")
        if max_steps is not None and total_steps >= max_steps:
            break

    for k, obj_id in enumerate(obj_ids):
        wdir = os.path.join(weight_root, f"{obj_id:02d}")
        st = jax.device_get(unstack_state(stacked, k))
        ckpt.export_inference(wdir, st.gen_params, st.gen_stats)
        print(f"obj {obj_id}: exported inference params to "
              f"{wdir}/inference")
    return stacked


def _save_epoch(weight_root, obj_ids, gen, stacked, stacked_store, n_valid,
                full_rot_v, epoch, cfg, key):
    """Per-object epoch checkpoints + validation montages."""
    kb = jax.random.split(key, len(obj_ids))
    for k, obj_id in enumerate(obj_ids):
        wdir = os.path.join(weight_root, f"{obj_id:02d}")
        st = jax.device_get(unstack_state(stacked, k))
        ckpt.save_train_state(wdir, st, epoch)
        store_k = jax.tree_util.tree_map(lambda x: x[k], stacked_store)
        vb = _make_batch(store_k, kb[k], 1, cfg.batch_size,
                         full_rotation=full_rot_v[k], n_valid=n_valid[k])
        gen_img, _ = gen.apply({"params": st.gen_params,
                                "batch_stats": st.gen_stats}, vb["src"])
        save_val_montage(os.path.join(wdir, "val_img",
                                      f"epoch_{epoch:02d}.png"),
                         vb["src"], vb["tgt"], gen_img)


def main(argv: Sequence[str] | None = None):
    import argparse

    from pix2pose_tpu.config import load_eval_config

    p = argparse.ArgumentParser(
        description="Fused multi-object GAN training (one chip, one "
                    "program for K objects) — the reference's train.sh "
                    "loop as a single launch.")
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("obj_ids", help="comma-separated object ids, e.g. 1,5,6")
    p.add_argument("back_dir")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--imagenet-h5", default=None)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="conv compute dtype (mixed precision; params fp32)")
    args = p.parse_args(argv)

    ecfg = load_eval_config(args.cfg)
    ds = BopDataset(ecfg.dataset_dir, args.dataset, train=True)
    kw = {"compute_dtype": args.dtype}
    if args.epochs:
        kw["max_epoch"] = args.epochs
    if args.batch:
        kw["batch_size"] = args.batch
    tcfg = TrainConfig(backbone=ecfg.backbone, **kw)
    obj_ids = [int(x) for x in args.obj_ids.split(",")]
    train_objects(ds, obj_ids, args.back_dir, tcfg,
                  max_steps=args.max_steps, imagenet_h5=args.imagenet_h5)


if __name__ == "__main__":
    main()
