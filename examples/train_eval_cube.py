"""End-to-end demo on synthetic data: build a BOP-layout cube dataset with
the in-repo rasterizer, render training pairs, train the coordinate
autoencoder as a GAN, evaluate with the trained network and score BOP'19 AR
— no downloads, one chip, a few minutes.

    python examples/train_eval_cube.py --steps 3000

Reference pipeline equivalents exercised: 2_1 colorize -> 2_2 pairs ->
3 train -> 5 eval -> (external bop_toolkit) scoring, all in-framework.

Observed on TPU v5e (2026-08-17): --steps 6000 (~10 min) AR 0.80,
ADD-0.1d 0.75; --backbone resnet50 --steps 6000 (from-scratch trunk,
~9 min) AR 0.84, ADD-0.1d 0.75. --steps 3000 is marginal (AR 0.5-0.7,
high seed variance across runs).
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
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--train-views", type=int, default=48)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="training compute dtype (mixed precision)")
    ap.add_argument("--backbone", choices=["paper", "resnet50"],
                    default="paper",
                    help="generator encoder (resnet50 = BOP'20 variant, "
                         "trained from scratch here)")
    ap.add_argument("--prosac-ab", action="store_true",
                    help="after training, evaluate BOTH the default "
                    "estimator (prosac, 32 hypotheses) and the "
                    "reference-semantics 100-uniform-hypothesis path on "
                    "the same weights and print both AR tables")
    ap.add_argument("--pnp-ab", action="store_true",
                    help="after training, evaluate the default estimator "
                    "plus the cheaper PnP solver variants (gn-half, ss4, "
                    "combined) on the same weights — the accuracy gate "
                    "for flipping those defaults (docs/PARITY.md cost "
                    "attribution)")
    args = ap.parse_args()

    from bop_fixture import build_cube_dataset
    from pix2pose_tpu.config import EvalConfig, TrainConfig
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.eval import BopEvaluator
    from pix2pose_tpu.eval.metrics import add_recall, evaluate_bop
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.detector import GtDetector
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.tools.render_training_pairs import \
        render_object_pairs
    from pix2pose_tpu.training.data import PatchStore, make_batch
    from pix2pose_tpu.training.gan import (create_train_state,
                                           make_train_step)

    root = tempfile.mkdtemp(prefix="cube_demo_")
    print(f"dataset root: {root}")
    build_cube_dataset(root, n_scenes=1, ims_per_scene=args.train_views,
                       split="train")
    build_cube_dataset(root + "_test", n_scenes=1, ims_per_scene=4,
                       split="test")
    ds_train = BopDataset(root, "cubes", train=True)
    n = render_object_pairs(ds_train, 1)
    print(f"rendered {n} training pairs")

    back_dir = os.path.join(root, "backs")
    os.makedirs(back_dir)
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (120, 160, 3)).astype(
            np.uint8)).save(os.path.join(back_dir, f"b{i}.png"))

    store = PatchStore.load(
        os.path.join(root, "cubes", "train_xyz", "01"), back_dir)
    cfg = TrainConfig(batch_size=args.batch, compute_dtype=args.dtype)
    gen = AutoEncoder(backbone=args.backbone, dtype=cfg.jnp_dtype)
    disc = Discriminator(dtype=cfg.jnp_dtype)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, cfg)
    raw_step = make_train_step(gen, disc, cfg)
    sym = jnp.eye(3)[None]

    # data synthesis fused into the step; metric fetches deferred to the
    # end (see CLAUDE.md: the first device->host transfer slows all later
    # launches on the axon relay)
    @jax.jit
    def step(state, store, it, lr, key):
        kb, ks = jax.random.split(key)
        batch = make_batch(store, kb, it, cfg.batch_size)
        return raw_step(state, batch, sym, lr, ks)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    history = []
    for it in range(args.steps):
        key, ks = jax.random.split(key)
        lr = 1e-3 if it < args.steps // 2 else (
            3e-4 if it < args.steps * 4 // 5 else 1e-4)
        state, m = step(state, store, it, lr, ks)
        if (it + 1) % 500 == 0:
            history.append((it, m))
    for it, m in [(i, jax.device_get(p)) for i, p in history]:
        print(f"it{it} recon={float(m['recon_loss']):.4f}")
    print(f"{args.steps} steps in {time.time() - t0:.0f}s")

    # Eval always runs fp32: params are fp32 and model-agnostic, so a
    # fresh fp32 generator keeps --dtype a TRAINING-only knob (otherwise
    # a bf16 run silently changes eval inference precision too and its AR
    # isn't comparable to the fp32-eval baseline).
    gen = AutoEncoder(backbone=args.backbone)

    ds_test = BopDataset(root + "_test", "cubes", train=False)
    ecfg = EvalConfig(dataset_dir=root + "_test", score_type=2,
                      task_type=2, cand_factor=1.0,
                      outlier_th=(0.1, 0.2, 0.3), inlier_th=0.3)
    params = {"params": state.gen_params, "batch_stats": state.gen_stats}
    obj_param = np.array([40., 40., 40., 0, 0, 0], np.float32)

    variants = [("default(prosac-32)", ecfg.estimator(0))]
    if args.prosac_ab:
        import dataclasses
        variants.append(("reference-100", dataclasses.replace(
            ecfg.estimator(0), prosac=False, ransac_iters=100)))
    if args.pnp_ab:
        import dataclasses
        base = ecfg.estimator(0)
        variants += [
            ("gn-half", dataclasses.replace(base, gn_refine_iters=4)),
            ("ss4", dataclasses.replace(base, select_stride=4)),
            ("gn4+ss4", dataclasses.replace(base, gn_refine_iters=4,
                                            select_stride=4)),
        ]
    for name, est_cfg in variants:
        est = Pix2PoseEstimator(gen, est_cfg)
        ev = BopEvaluator(ds_test, ecfg, est, {1: params},
                          {1: obj_param}, GtDetector(ds_test, jitter=5),
                          max_det=2)
        results = ev.run(out_dir=os.path.join(root, "out"))
        scores = evaluate_bop(results, ds_test)
        tag = f"[{name}] " if len(variants) > 1 else ""
        print(tag + "AR:", {k: round(v, 3) for k, v in scores.items()
                            if k.startswith("AR")})
        print(tag + "ADD-0.1d recall:", add_recall(results, ds_test))


if __name__ == "__main__":
    main()
