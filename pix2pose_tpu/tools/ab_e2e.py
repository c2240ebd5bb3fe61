"""Paired-seed A/B adjudication for e2e accuracy changes.

The cube e2e's AR is noisy (3k-step runs spread 0.52-0.71 across
near-equivalent code; 6k narrows but doesn't kill it — see CLAUDE.md),
so single runs mis-adjudicate optimizations: ``gn_refine_iters=4``
passed one cube run while degrading the solver corruption sweep 3x.
This tool automates the protocol those incidents taught: baseline (A)
vs candidate (B) on IDENTICAL data streams across N seeds, per-seed AR
deltas, pass/fail against a declared margin.

  # estimator knob (trains once per seed, evaluates both variants on
  # the same weights — the pure-inference A/B used to validate
  # select_stride=4):
  python -m pix2pose_tpu.tools.ab_e2e --b select_stride=4 --seeds 3

  # training knob (trains BOTH variants per seed with the same data
  # key; 2x cost):
  python -m pix2pose_tpu.tools.ab_e2e --b train.compute_dtype=bfloat16

Pass rule: mean(AR_B - AR_A) >= -margin AND min per-seed delta >=
-2*margin (default margin 0.03 ~ the measured 6k-step paired spread).
Exit code 0 = pass, 1 = fail, so it gates CI/scripts directly.

No reference equivalent: the reference has no accuracy-regression
tooling at all (its repo has zero tests); this is framework
infrastructure the rebuild needs because it A/Bs optimizations the
reference never attempts.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def _coerce(cls, name, raw):
    """Parse a CLI string into the declared type of field ``name``."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    if name not in fields:
        raise SystemExit(
            f"unknown {cls.__name__} field {name!r}; have "
            f"{sorted(fields)}")
    cur = getattr(cls(), name, fields[name].default)
    if cur is None:
        # Optional fields (e.g. max_pnp_points: int | None): "none" stays
        # None, otherwise parse numerically before falling back to str
        if raw.lower() == "none":
            return None
        for cast in (int, float):
            try:
                return cast(raw)
            except ValueError:
                pass
        return raw
    if isinstance(cur, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(cur, int):
        return int(raw)
    if isinstance(cur, float):
        return float(raw)
    if isinstance(cur, tuple):
        return tuple(float(x) for x in raw.split(","))
    if raw.lower() == "none":
        return None
    return raw


def parse_overrides(pairs):
    """Split ``k=v`` CLI pairs into (train_overrides, est_overrides)."""
    from pix2pose_tpu.config import EstimatorConfig, TrainConfig

    train_o, est_o = {}, {}
    for p in pairs or ():
        k, _, v = p.partition("=")
        if not v:
            raise SystemExit(f"override {p!r} is not k=v")
        if k.startswith("train."):
            k = k[len("train."):]
            train_o[k] = _coerce(TrainConfig, k, v)
        else:
            est_o[k] = _coerce(EstimatorConfig, k, v)
    return train_o, est_o


def _build_dataset(root, train_views):
    from bop_fixture import build_cube_dataset
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.tools.render_training_pairs import \
        render_object_pairs

    build_cube_dataset(root, n_scenes=1, ims_per_scene=train_views,
                       split="train")
    build_cube_dataset(root + "_test", n_scenes=1, ims_per_scene=4,
                       split="test")
    render_object_pairs(BopDataset(root, "cubes", train=True), 1)
    os.makedirs(root + "/backs", exist_ok=True)
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (120, 160, 3)).astype(
            np.uint8)).save(f"{root}/backs/b{i}.png")


def _train(store, seed, steps, train_overrides, backbone):
    """One GAN training run; the data stream is keyed by ``seed`` only,
    so two calls with the same seed consume IDENTICAL batches."""
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import TrainConfig
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.training.data import make_batch
    from pix2pose_tpu.training.gan import (create_train_state,
                                           make_train_step)

    cfg = TrainConfig(batch_size=32, **train_overrides)
    gen = AutoEncoder(backbone=backbone, dtype=cfg.jnp_dtype)
    disc = Discriminator(dtype=cfg.jnp_dtype)
    state = create_train_state(jax.random.PRNGKey(seed), gen, disc, cfg)
    raw_step = make_train_step(gen, disc, cfg)
    sym = jnp.eye(3)[None]

    @jax.jit
    def step(state, store, it, lr, key):
        kb, ks = jax.random.split(key)
        batch = make_batch(store, kb, it, cfg.batch_size)
        return raw_step(state, batch, sym, lr, ks)

    key = jax.random.PRNGKey(1000 + seed)
    for it in range(steps):
        key, ks = jax.random.split(key)
        lr = 1e-3 if it < steps // 2 else (
            3e-4 if it < steps * 4 // 5 else 1e-4)
        state, _ = step(state, store, it, lr, ks)
        if (it + 1) % 200 == 0:
            jax.block_until_ready(state.gen_params)
    return {"params": state.gen_params, "batch_stats": state.gen_stats}


def _evaluate(root, params, est_overrides, backbone, seed):
    import dataclasses as dc

    from pix2pose_tpu.config import EvalConfig
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.eval import BopEvaluator
    from pix2pose_tpu.eval.metrics import evaluate_bop
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.detector import GtDetector
    from pix2pose_tpu.models import AutoEncoder

    ds_test = BopDataset(root + "_test", "cubes", train=False)
    ecfg = EvalConfig(dataset_dir=root + "_test", score_type=2,
                      task_type=2, cand_factor=1.0,
                      outlier_th=(0.1, 0.2, 0.3), inlier_th=0.3)
    est_cfg = dc.replace(ecfg.estimator(0), **est_overrides)
    est = Pix2PoseEstimator(AutoEncoder(backbone=backbone), est_cfg)
    obj_param = np.array([40., 40., 40., 0, 0, 0], np.float32)
    # detector jitter keyed by seed so A and B see the same boxes
    ev = BopEvaluator(ds_test, ecfg, est, {1: params}, {1: obj_param},
                      GtDetector(ds_test, jitter=5, seed=seed), max_det=2)
    return evaluate_bop(ev.run(), ds_test)["AR"]


def run_ab(seeds, steps, a_pairs, b_pairs, backbone="paper",
           train_views=48, margin=0.03, root=None):
    """Returns the result dict (also printed as one JSON line)."""
    train_a, est_a = parse_overrides(a_pairs)
    train_b, est_b = parse_overrides(b_pairs)
    retrain = train_a != train_b

    root = root or tempfile.mkdtemp(prefix="ab_e2e_")
    if not os.path.isdir(os.path.join(root, "cubes")):
        _build_dataset(root, train_views)

    from pix2pose_tpu.training.data import PatchStore

    store = PatchStore.load(os.path.join(root, "cubes", "train_xyz",
                                         "01"), root + "/backs")
    rows = []
    for seed in range(seeds):
        t0 = time.time()
        params_a = _train(store, seed, steps, train_a, backbone)
        params_b = (_train(store, seed, steps, train_b, backbone)
                    if retrain else params_a)
        ar_a = _evaluate(root, params_a, est_a, backbone, seed)
        ar_b = _evaluate(root, params_b, est_b, backbone, seed)
        rows.append({"seed": seed, "ar_a": round(ar_a, 4),
                     "ar_b": round(ar_b, 4),
                     "delta": round(ar_b - ar_a, 4)})
        print(f"seed {seed}: A={ar_a:.3f} B={ar_b:.3f} "
              f"delta={ar_b - ar_a:+.3f} ({time.time() - t0:.0f}s)",
              flush=True)

    deltas = [r["delta"] for r in rows]
    mean_d, min_d = float(np.mean(deltas)), float(np.min(deltas))
    ok = mean_d >= -margin and min_d >= -2 * margin
    out = {"metric": "ab_delta_AR", "rows": rows,
           "mean_delta": round(mean_d, 4), "min_delta": round(min_d, 4),
           "margin": margin, "pass": ok,
           "a": list(a_pairs or ()), "b": list(b_pairs or ()),
           "steps": steps, "retrained": retrain}
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--a", action="append", default=[], metavar="K=V",
                    help="baseline overrides (estimator field, or "
                         "train.<field>)")
    ap.add_argument("--b", action="append", default=[], metavar="K=V",
                    help="candidate overrides")
    ap.add_argument("--backbone", choices=["paper", "resnet50"],
                    default="paper")
    ap.add_argument("--margin", type=float, default=0.03)
    ap.add_argument("--root", default=None,
                    help="reuse a dataset root across invocations")
    args = ap.parse_args(argv)
    out = run_ab(args.seeds, args.steps, args.a, args.b, args.backbone,
                 margin=args.margin, root=args.root)
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
