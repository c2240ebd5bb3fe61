"""One-command full-dress parity rehearsal.

Runs the COMPLETE reference flow (``README.md:96-115``: scene gen ->
colorize -> render pairs -> train detector + per-object generators ->
eval RGB -> eval RGB-D/ICP -> BOP CSVs) end-to-end on a self-built
synthetic BOP-format dataset covering the hard axes of the real sets
(duplicate same-class instances, discrete + continuous symmetry, a
UV-textured object — :mod:`pix2pose_tpu.data.synthetic_bop`), with NO
ground-truth components at inference time. Both detector transports are
exercised: the in-process trained CenterNet+CondInst (JaxDetector) and
the reference's file interchange (detections dumped to JSON, replayed
through PrecomputedDetector — ``tools/mask_rcnn_util.py:67-133``
contract), so a real-data parity run (tools/parity_lmo.py) changes only
a dataset path.

    python -m pix2pose_tpu rehearsal [--gan-steps 6000 --det-steps 3000]

Emits the AR table per evaluator x transport, box/mask detection mAP,
BOP CSVs, and ``rehearsal_summary.json`` under --out.

Measured numbers: see docs/PARITY.md "Rehearsal" (recorded from real
TPU runs of this command at defaults).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _rle_encode(mask) -> dict:
    """Row-major uncompressed RLE starting with a False run — the
    PrecomputedDetector input format."""
    flat = np.asarray(mask, bool).reshape(-1)
    # run boundaries
    idx = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], idx, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0]:  # must start with a False run
        runs = [0] + runs
    return {"size": list(mask.shape), "counts": runs}


def dump_detections(detector, ds, target_list, path) -> int:
    """Run ``detector`` over the target images and write the JSON
    interchange file (boxes, scores, RLE instance masks)."""
    entries = []
    for scene_id, im_id, _, _ in target_list:
        rgb = ds.load_rgb(scene_id, im_id)
        for d in detector.detect(scene_id, im_id, rgb):
            e = {"scene_id": int(scene_id), "im_id": int(im_id),
                 "obj_id": int(d.obj_id), "score": float(d.score),
                 "bbox": [int(x) for x in d.bbox]}
            if d.mask is not None:
                e["mask_rle"] = _rle_encode(d.mask)
            entries.append(e)
    with open(path, "w") as f:
        json.dump(entries, f)
    return len(entries)


def _detector_scale_range(ds, det_im, patch_px=128, margin=1.3):
    """Patch-placement scale range matched to the split's APPARENT
    instance sizes in the detector's (det_im, det_im) input frame.

    Root cause this guards (diagnosed 2026-08-20 on the first full-dress
    run): the composer's default ``scale_range=(0.6, 1.6)`` trains on
    77-205 px instances while this dataset's objects appear at ~30-65 px
    after the 640x480 -> det_im anisotropic resize — the detector then
    merges adjacent duplicate instances into one box and misses the
    small objects entirely (recall 11/30; the merged-crop poses PnP'd
    ~200 mm off). The composer docstring documents the same failure on
    the duplicate-cube e2e.
    """
    from PIL import Image

    im_w, im_h = ds.im_size
    sizes = []
    for scene_id in ds.scene_ids():
        for im_id, gt_list in sorted(ds.scene_gt(scene_id).items())[:12]:
            for gt_id in range(len(gt_list)):
                p = ds.mask_path(scene_id, im_id, gt_id, visib=True)
                if not os.path.exists(p):
                    continue
                m = np.asarray(Image.open(p)) > 127
                if m.sum() < 64:
                    continue
                v, u = np.where(m)
                sizes.append(max((v.max() - v.min() + 1) * det_im / im_h,
                                 (u.max() - u.min() + 1) * det_im / im_w))
    if not sizes:
        return (0.6, 1.6)
    lo = float(np.percentile(sizes, 5)) / patch_px / margin
    hi = float(np.percentile(sizes, 95)) / patch_px * margin
    return (max(round(lo, 2), 0.08), min(round(hi, 2), 1.6))


def run_rehearsal(out_root=None, gan_steps=6000, det_steps=3000,
                  n_train=48, n_test=6, det_batch=8, det_im=384,
                  det_k_obj=8, map_images=32, icp=True, seed=0,
                  det_score_th=0.2):
    """Full pipeline; returns the summary dict."""
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import EvalConfig, TrainConfig
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.data.ply import load_ply
    from pix2pose_tpu.data.synthetic_bop import build_rehearsal_dataset
    from pix2pose_tpu.eval import BopEvaluator
    from pix2pose_tpu.eval.bop_eval_icp import BopEvaluatorICP
    from pix2pose_tpu.eval.detection_metrics import (
        collect_synthetic_detections, evaluate_detections)
    from pix2pose_tpu.eval.metrics import evaluate_bop
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.detector import PrecomputedDetector
    from pix2pose_tpu.inference.jax_detector import JaxDetector
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.tools.colorize_models import colorize_dataset
    from pix2pose_tpu.tools.render_training_pairs import \
        render_object_pairs
    from pix2pose_tpu.training.data import PatchStore
    from pix2pose_tpu.training.detector_data import (DetectorStore,
                                                     make_detector_batch)
    from pix2pose_tpu.training.detector_train import (
        create_detector_state, make_detector_step)
    from pix2pose_tpu.training.gan import create_train_state
    from pix2pose_tpu.training.multi import (make_multi_step, stack_states,
                                             stack_stores, stack_sym_pools,
                                             unstack_state)
    from pix2pose_tpu.utils.symmetry import training_sym_pool

    try:
        cpu = jax.devices("cpu")[0]
        accel = [d for d in jax.devices() if d.platform != "cpu"][0]
    except (RuntimeError, IndexError):
        cpu = accel = jax.devices()[0]

    import tempfile

    root = out_root or tempfile.mkdtemp(prefix="rehearsal_")
    out_dir = os.path.join(root, "out")
    os.makedirs(out_dir, exist_ok=True)
    summary = {"root": root}
    t_all = time.time()

    # ---- 1. dataset (scene gen, ``1_1`` + test split) ----
    print(f"[rehearsal] building dataset under {root}", flush=True)
    build_rehearsal_dataset(root, n_train=n_train, n_test=n_test,
                            seed=seed)
    ds_train = BopDataset(root, "rehearsal", train=True)
    ds_test = BopDataset(root, "rehearsal", train=False)
    obj_ids = list(ds_train.model_ids)

    # ---- 2. colorize (``2_1``) ----
    colorize_dataset(ds_train)
    with open(os.path.join(ds_train.dir, "models_xyz",
                           "norm_factor.json")) as f:
        norm = json.load(f)

    # ---- 3. training pairs (``2_2``, sym canonicalization + locks) ----
    locks = {}
    for o in obj_ids:
        n = render_object_pairs(ds_train, o)
        with open(os.path.join(ds_train.dir, "train_xyz", f"{o:02d}",
                               "meta.json")) as f:
            locks[o] = json.load(f)["rotation_lock"]
        print(f"[rehearsal] obj {o}: {n} pairs (lock={locks[o]})",
              flush=True)

    back_dir = os.path.join(root, "backs")
    os.makedirs(back_dir, exist_ok=True)
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, (120, 160, 3)).astype(
            np.uint8)).save(os.path.join(back_dir, f"b{i}.png"))
    # solid backgrounds keep the test split's plain white frame in-domain
    # for the detector (the composer's flat-background branch only covers
    # mid-gray values)
    for i, val in enumerate((255, 230, 160)):
        Image.fromarray(np.full((120, 160, 3), val, np.uint8)).save(
            os.path.join(back_dir, f"s{i}.png"))

    stores = {o: PatchStore.load(
        os.path.join(ds_train.dir, "train_xyz", f"{o:02d}"), back_dir)
        for o in obj_ids}

    # ---- 4. fused generator training (``3_train`` x objects) ----
    cfg = TrainConfig(batch_size=32)
    gen, disc = AutoEncoder(), Discriminator()
    states = [create_train_state(jax.random.PRNGKey(o), gen, disc, cfg)
              for o in obj_ids]
    stacked = stack_states(states)
    stacked_store, n_valid = stack_stores([stores[o] for o in obj_ids])
    sym_pools = stack_sym_pools(
        [np.asarray(training_sym_pool(ds_train, o)) for o in obj_ids])
    full_rot = jnp.asarray([not locks[o] for o in obj_ids])
    step_fn = make_multi_step(gen, disc, cfg)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for it in range(gan_steps):
        key, ks = jax.random.split(key)
        lr = 1e-3 if it < gan_steps // 2 else (
            3e-4 if it < gan_steps * 4 // 5 else 1e-4)
        stacked, m = step_fn(stacked, stacked_store, n_valid, full_rot,
                             sym_pools, it, lr,
                             jax.random.split(ks, len(obj_ids)))
        if (it + 1) % 100 == 0:
            jax.block_until_ready(m["recon_loss"])
    print(f"[rehearsal] {gan_steps} fused GAN steps x {len(obj_ids)} "
          f"objects in {time.time() - t0:.0f}s", flush=True)
    params_by_obj = {}
    for k, o in enumerate(obj_ids):
        st = jax.device_get(unstack_state(stacked, k))
        params_by_obj[o] = {"params": st.gen_params,
                            "batch_stats": st.gen_stats}
    obj_params = {}
    for o in obj_ids:
        nf = norm[str(o)]
        obj_params[o] = np.array(
            [nf["x_scale"], nf["y_scale"], nf["z_scale"],
             nf["x_ct"], nf["y_ct"], nf["z_ct"]], np.float32)

    # ---- 5. detector training (``1_2`` equivalent) ----
    dstore = DetectorStore.from_patch_stores(
        stores, stores[obj_ids[0]].backs)
    dstore = jax.tree_util.tree_map(lambda x: jax.device_put(x, accel),
                                    dstore)
    det_model = CenterNetDetector(num_classes=len(obj_ids))
    with jax.default_device(cpu):
        dstate = create_detector_state(jax.random.PRNGKey(2), det_model,
                                       det_im)
    dstate = jax.device_put(dstate, accel)
    raw_dstep = make_detector_step(det_model)
    det_scale = _detector_scale_range(ds_train, det_im)
    summary["det_scale_range"] = det_scale
    print(f"[rehearsal] detector scale_range={det_scale}", flush=True)

    @jax.jit
    def dstep(state, dstore, key, lr):
        batch = make_detector_batch(dstore, key, det_batch, det_im,
                                    k_obj=det_k_obj,
                                    scale_range=det_scale)
        return raw_dstep(state, batch, lr)

    key = jax.device_put(jax.random.PRNGKey(3), accel)
    t0 = time.time()
    for it in range(det_steps):
        key, kb = jax.random.split(key)
        lr = 3e-4 * min(1.0, (it + 1) / 200)
        if it > det_steps * 0.8:
            lr = 1e-4
        dstate, parts = dstep(dstate, dstore, kb, lr)
        if (it + 1) % 100 == 0:
            jax.block_until_ready(dstate.params)
    print(f"[rehearsal] {det_steps} detector steps in "
          f"{time.time() - t0:.0f}s", flush=True)
    det_vars = {"params": dstate.params, "batch_stats": dstate.stats}

    # persist trained weights before any eval step can fail — a crashed
    # eval leg must never cost the ~15 min of training above
    import pickle

    with open(os.path.join(out_dir, "weights.pkl"), "wb") as f:
        pickle.dump({"gen": jax.device_get(params_by_obj),
                     "det": jax.device_get(det_vars),
                     "obj_params": obj_params, "locks": locks}, f)

    # ---- 6. detection quality: box + mask mAP ----
    preds, gts = collect_synthetic_detections(
        det_model, det_vars, dstore, n_images=map_images,
        key=jax.random.PRNGKey(11), im_size=det_im, k_obj=det_k_obj,
        batch_size=4, score_floor=0.05, with_masks=True,
        scale_range=det_scale)
    res_box = evaluate_detections(preds, gts)
    res_mask = evaluate_detections(preds, gts, iou_type="mask")
    summary["det_box_mAP50"] = round(res_box["mAP50"], 4)
    summary["det_box_mAP75"] = round(res_box["mAP75"], 4)
    summary["det_mask_mAP50"] = round(res_mask["mAP50"], 4)
    summary["det_mask_mAP75"] = round(res_mask["mAP75"], 4)
    print(f"[rehearsal] box mAP50={res_box['mAP50']:.3f} "
          f"mask mAP50={res_mask['mAP50']:.3f} (composed domain)",
          flush=True)

    # ---- 7/8. both evaluators x both detector transports ----
    jd = JaxDetector(det_model, det_vars, class_to_obj_id=obj_ids,
                     score_th=det_score_th, input_size=det_im)
    from pix2pose_tpu.data.bop import get_target_list
    from pix2pose_tpu.eval.detection_metrics import \
        collect_bop_split_detections

    target_list = get_target_list(
        os.path.join(ds_test.dir, "test_targets_bop19.json"))

    # honest deployment-domain detection quality: the REAL test images
    tp, tg = collect_bop_split_detections(jd, ds_test, target_list)
    res_tbox = evaluate_detections(tp, tg)
    res_tmask = evaluate_detections(tp, tg, iou_type="mask")
    summary["det_test_box_mAP50"] = round(res_tbox["mAP50"], 4)
    summary["det_test_mask_mAP50"] = round(res_tmask["mAP50"], 4)
    n_tgt = sum(len(g["cls"]) for g in tg)
    n_det = sum(len(p["cls"]) for p in tp)
    summary["det_test_n_gt"] = n_tgt
    summary["det_test_n_det"] = n_det
    print(f"[rehearsal] TEST-split box mAP50={res_tbox['mAP50']:.3f} "
          f"mask mAP50={res_tmask['mAP50']:.3f} "
          f"({n_det} dets / {n_tgt} gt)", flush=True)
    det_json = os.path.join(out_dir, "detections.json")
    n_dumped = dump_detections(jd, ds_test, target_list, det_json)
    print(f"[rehearsal] dumped {n_dumped} detections -> {det_json}",
          flush=True)
    pre = PrecomputedDetector(det_json)

    ecfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                      cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                      inlier_th=0.3)
    est = Pix2PoseEstimator(gen, ecfg.estimator(0))
    meshes = {}
    if icp:
        for o in obj_ids:
            m = load_ply(ds_test.model_ply_path(o))
            meshes[o] = (m["pts"], m["faces"])

    def _ar(results):
        sc = evaluate_bop(results, ds_test)
        return {k: round(v, 4) for k, v in sc.items()
                if k.startswith("AR")}, sc.get("per_object", {})

    for tag, detector in (("centernet", jd), ("precomputed", pre)):
        ev = BopEvaluator(ds_test, ecfg, est, params_by_obj, obj_params,
                          detector, max_det=4,
                          method_name=f"rehearsal-{tag}")
        res = ev.run(target_list=target_list, out_dir=out_dir,
                     key=jax.random.PRNGKey(7))
        ar, per_obj = _ar(res)
        summary[f"AR_rgb_{tag}"] = ar
        summary[f"AR_rgb_{tag}_per_object"] = {
            str(o): {m: round(v, 4) for m, v in rec.items()}
            for o, rec in per_obj.items()}
        print(f"[rehearsal] RGB  {tag:12s} {ar}", flush=True)
        if icp:
            evi = BopEvaluatorICP(ds_test, ecfg, est, params_by_obj,
                                  obj_params, meshes, detector, max_det=4,
                                  batched=True,
                                  method_name=f"rehearsal-{tag}-icp")
            resi = evi.run(target_list=target_list, out_dir=out_dir,
                           key=jax.random.PRNGKey(7))
            ari, _ = _ar(resi)
            summary[f"AR_rgbd_{tag}"] = ari
            print(f"[rehearsal] RGBD {tag:12s} {ari}", flush=True)

    summary["wall_s"] = round(time.time() - t_all, 1)
    with open(os.path.join(out_dir, "rehearsal_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[rehearsal] done in {summary['wall_s']}s; summary + CSVs in "
          f"{out_dir}", flush=True)
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", default=None,
                    help="dataset/output root (default: mkdtemp)")
    ap.add_argument("--gan-steps", type=int, default=6000)
    ap.add_argument("--det-steps", type=int, default=3000)
    ap.add_argument("--train-views", type=int, default=48)
    ap.add_argument("--test-views", type=int, default=6)
    ap.add_argument("--no-icp", action="store_true")
    args = ap.parse_args(argv)
    run_rehearsal(out_root=args.root, gan_steps=args.gan_steps,
                  det_steps=args.det_steps, n_train=args.train_views,
                  n_test=args.test_views, icp=not args.no_icp)


if __name__ == "__main__":
    main()
