"""End-to-end fused multi-object training demo: build the 4-shape ViVo
dataset (cube, discretely-symmetric square prism, octahedron, and a
continuously-symmetric cylinder) with the
in-repo rasterizer, render per-object training pairs, train ALL FOUR
generators in ONE fused program (``training/multi.py`` — the reference's
sequential per-object ``train.sh`` jobs as a single launch,
``train.sh:1-21``), then evaluate ViVo AR on held-out occluded scenes
with the trained networks.

Exercises the fused trainer's per-object traced state end-to-end:
different store sizes, a padded symmetry pool (the prism's z180 from
models_info vs identity-only for the others), and per-object checkpoint
export consumed by the evaluator.

    python examples/multishape_fused_e2e.py --steps 6000   # TPU, ~10 min
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--train-views", type=int, default=24,
                    help="scenes' images per split; each image carries "
                         "all 3 objects, so pairs/object = this")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--root", default=None,
                    help="reuse a dataset/weights root across runs")
    ap.add_argument("--reuse", action="store_true",
                    help="load weights cached under --root (skip training)")
    ap.add_argument("--pnp-stride", type=int, default=None,
                    help="override EstimatorConfig.pnp_stride at eval")
    ap.add_argument("--diagnose", action="store_true",
                    help="per-object decode-quality probe on a GT view")
    args = ap.parse_args()

    from bop_fixture import build_multishape_dataset, multishape_objects
    from pix2pose_tpu.config import EvalConfig, TrainConfig
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.eval import BopEvaluator
    from pix2pose_tpu.eval.metrics import evaluate_bop
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.detector import GtDetector
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.tools.render_training_pairs import \
        render_object_pairs
    from pix2pose_tpu.training.data import PatchStore
    from pix2pose_tpu.training.gan import create_train_state
    from pix2pose_tpu.training.multi import (make_multi_step, stack_states,
                                             stack_stores, stack_sym_pools,
                                             unstack_state)

    root = args.root or tempfile.mkdtemp(prefix="shapes_demo_")
    print(f"dataset root: {root}")
    obj_ids = sorted(multishape_objects().keys())
    if not os.path.exists(os.path.join(root, "shapes")):
        build_multishape_dataset(root, n_scenes=1,
                                 ims_per_scene=args.train_views,
                                 split="train")
        build_multishape_dataset(root + "_test", n_scenes=1,
                                 ims_per_scene=4, split="test", seed=23)
        ds_train = BopDataset(root, "shapes", train=True)
        for obj_id in obj_ids:
            n = render_object_pairs(ds_train, obj_id)
            print(f"obj {obj_id}: rendered {n} training pairs")
    ds_train = BopDataset(root, "shapes", train=True)

    import pickle

    cache = os.path.join(root, "weights.pkl")
    gen, disc = AutoEncoder(backbone="paper"), Discriminator()
    if args.reuse and os.path.exists(cache):
        with open(cache, "rb") as f:
            params_by_obj = pickle.load(f)
        print(f"reusing trained weights from {cache}")
        do_train = False
    else:
        do_train = True
    back_dir = os.path.join(root, "backs")
    os.makedirs(back_dir, exist_ok=True)
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (120, 160, 3)).astype(
            np.uint8)).save(os.path.join(back_dir, f"b{i}.png"))

    # --- fused 4-object training (skipped under --reuse) --------------
    import json

    stores = [PatchStore.load(
        os.path.join(root, "shapes", "train_xyz", f"{o:02d}"), back_dir)
        for o in obj_ids]
    from pix2pose_tpu.utils.symmetry import training_sym_pool
    pools = [np.asarray(training_sym_pool(ds_train, o)) for o in obj_ids]
    print("symmetry pool sizes:", [p.shape[0] for p in pools])
    # per-object rotation locks from the pair renderer (continuous-sym
    # objects whose axis came camera-parallel in some view train with
    # restricted in-plane rotation, reference ``2_2:26-52``)
    locks = []
    for o in obj_ids:
        with open(os.path.join(root, "shapes", "train_xyz", f"{o:02d}",
                               "meta.json")) as f:
            locks.append(json.load(f)["rotation_lock"])
    print("rotation locks:", dict(zip(obj_ids, locks)))
    cfg = TrainConfig(batch_size=args.batch)
    states = [create_train_state(jax.random.PRNGKey(o), gen, disc, cfg)
              for o in obj_ids]
    stacked = stack_states(states)
    stacked_store, n_valid = stack_stores(stores)
    sym_pools = stack_sym_pools(pools)
    full_rot = jnp.asarray([not lk for lk in locks])
    step_fn = make_multi_step(gen, disc, cfg)

    if do_train:
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        history = []
        for it in range(args.steps):
            key, ks = jax.random.split(key)
            lr = 1e-3 if it < args.steps // 2 else (
                3e-4 if it < args.steps * 4 // 5 else 1e-4)
            stacked, m = step_fn(stacked, stacked_store, n_valid,
                                 full_rot, sym_pools, it, lr,
                                 jax.random.split(ks, len(obj_ids)))
            if (it + 1) % 1000 == 0:
                history.append((it, m))
            if (it + 1) % 100 == 0:
                jax.block_until_ready(m["recon_loss"])
        for it, m in [(i, jax.device_get(p)) for i, p in history]:
            recon = " ".join(f"{v:.4f}" for v in m["recon_loss"])
            print(f"it{it} recon=[{recon}]")
        print(f"{args.steps} fused steps x {len(obj_ids)} objects in "
              f"{time.time() - t0:.0f}s")
        params_by_obj = {}
        for k, o in enumerate(obj_ids):
            st = jax.device_get(unstack_state(stacked, k))
            params_by_obj[o] = {"params": st.gen_params,
                                "batch_stats": st.gen_stats}
        with open(cache, "wb") as f:
            pickle.dump(params_by_obj, f)

    # --- ViVo eval with the trained generators ------------------------
    ds_test = BopDataset(root + "_test", "shapes", train=False)
    ecfg = EvalConfig(dataset_dir=root + "_test", score_type=2,
                      task_type=2, cand_factor=1.0,
                      outlier_th=(0.1, 0.2, 0.3), inlier_th=0.3)
    objs = multishape_objects()
    obj_params = {}
    for o in obj_ids:
        obj_params[o] = np.concatenate(
            [objs[o][2], np.zeros(3)]).astype(np.float32)
    est = Pix2PoseEstimator(gen, ecfg.estimator(0),
                            pnp_stride=args.pnp_stride)

    if args.diagnose:
        # per-object decode-frame probe: median error of the generator's
        # decoded XYZ vs the GT-rendered XYZ map under EACH symmetry-pool
        # frame — separates "decode is garbage", "decode locked to the
        # wrong/mixed symmetry frame", and "decode fine, PnP at fault"
        from pix2pose_tpu.ops import rasterizer
        from pix2pose_tpu.ops.color import color01_to_xyz as c2x

        im_w_t, im_h_t = ds_test.im_size
        cam0 = ds_test.scene_camera(0)[0]
        rgb0 = jnp.asarray(ds_test.load_rgb(0, 0))
        gt0 = ds_test.scene_gt(0)[0]
        for o in obj_ids:
            g = next(gg for gg in gt0 if gg["obj_id"] == o)
            verts, faces, scale = objs[o][:3]
            xyzmap = rasterizer.render_mesh(
                verts, faces, verts, g["R"], g["t"], cam0["cam_K"],
                im_h_t, im_w_t)
            m = np.asarray(xyzmap.mask)
            vu = np.where(m)
            bbox = np.array([[vu[0].min(), vu[1].min(),
                              vu[0].max(), vu[1].max()]], np.int32)
            out = est(params_by_obj[o], rgb0, jnp.asarray(bbox),
                      jnp.asarray([True]), jnp.asarray(cam0["cam_K"]),
                      jnp.asarray(obj_params[o]), jax.random.PRNGKey(9))
            from pix2pose_tpu.ops import crop as crop_ops

            box2 = jax.tree_util.tree_map(lambda a: a[0], out.box2)
            # NOTE: zeros (not NaN) outside the mask — the crop resample
            # is matmul-based, so any NaN poisons the whole output
            attr_np = np.where(m[..., None], np.asarray(xyzmap.attr), 0.0)
            gt_xyz_crop = np.stack([np.asarray(crop_ops.crop_resize_2d(
                jnp.asarray(attr_np[..., c]), box2, 128, False))
                for c in range(3)], axis=-1)
            mask_crop = np.asarray(crop_ops.crop_resize_2d(
                jnp.asarray(m.astype(np.float32)), box2, 128,
                False)) > 0.9  # interior only: edge pixels mix with bg 0
            dec_mm = np.asarray(c2x(out.xyz128[0],
                                    jnp.asarray(obj_params[o][:3]),
                                    jnp.asarray(obj_params[o][3:])))
            fg = np.asarray(out.fg128[0]) & mask_crop
            pool = np.asarray(ds_test.symmetry_pool(o))
            stats = []
            per_px = []
            for Rs in pool:
                err = np.linalg.norm(dec_mm - gt_xyz_crop @ Rs.T,
                                     axis=-1)
                per_px.append(err)
                stats.append(float(np.median(err[fg])) if fg.any()
                             else float("nan"))
            shares = ""
            if len(pool) > 1 and fg.any():
                nearest = np.argmin(np.stack(per_px), axis=0)
                sh = [float((nearest[fg] == i).mean())
                      for i in range(len(pool))]
                shares = " share=" + "/".join(f"{x:.2f}" for x in sh)
            print(f"[diag] obj {o}: fg={int(fg.sum())}px "
                  f"med_err_mm per frame="
                  + "/".join(f"{x:.1f}" for x in stats) + shares
                  + f" pose_ok={bool(out.valid[0])} "
                  f"terr={np.linalg.norm(np.asarray(out.t[0]) - g['t']):.1f}mm",
                  flush=True)
    ev = BopEvaluator(ds_test, ecfg, est, params_by_obj, obj_params,
                      GtDetector(ds_test, jitter=3), max_det=4)
    results = ev.run(out_dir=os.path.join(root, "out"))
    scores = evaluate_bop(results, ds_test, metrics=("mssd", "mspd"))
    print("AR:", {k: round(v, 3) for k, v in scores.items()
                  if k.startswith("AR")})
    # per-object: the continuously-symmetric cylinder (4) must land
    # within noise of the discretely-symmetric prism (2) — the whole
    # canonicalization + rotation-lock + densified-sym-scoring chain
    names = {1: "cube", 2: "prism(z180)", 3: "octahedron",
             4: "cylinder(cont-z)"}
    for o, rec in sorted(scores["per_object"].items()):
        print(f"  obj {o} {names.get(o, ''):18s} "
              + " ".join(f"{m}={v:.3f}" for m, v in rec.items()))


if __name__ == "__main__":
    main()
