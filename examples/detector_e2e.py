"""End-to-end detector demo: synthesize a cube dataset, train the CenterNet
detector on device-composed scenes, then run the full detector-driven
pose pipeline (no GT boxes anywhere) and score BOP AR.

    python examples/detector_e2e.py --steps 1500

Includes the axon-relay workarounds documented in CLAUDE.md (CPU-side
init, periodic scalar reads); on production PJRT these are harmless.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--root", default="/tmp/detector_e2e_demo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        cpu = jax.devices("cpu")[0]
        accel = [d for d in jax.devices() if d.platform != "cpu"][0]
    except (RuntimeError, IndexError):
        cpu = accel = jax.devices()[0]

    from bop_fixture import build_cube_dataset
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.tools.render_training_pairs import \
        render_object_pairs
    from pix2pose_tpu.training.data import PatchStore
    from pix2pose_tpu.training.detector_data import (DetectorStore,
                                                     make_detector_batch)
    from pix2pose_tpu.training.detector_train import (
        create_detector_state, make_detector_step)
    from pix2pose_tpu.models.detector import CenterNetDetector

    root = args.root
    if not os.path.isdir(os.path.join(root, "cubes")):
        build_cube_dataset(root, n_scenes=1, ims_per_scene=48,
                           split="train")
        build_cube_dataset(root + "_test", n_scenes=1, ims_per_scene=4,
                           split="test")
        ds_train = BopDataset(root, "cubes", train=True)
        render_object_pairs(ds_train, 1)
        os.makedirs(root + "/backs", exist_ok=True)
        from PIL import Image

        rng = np.random.RandomState(0)
        for i in range(8):
            Image.fromarray(rng.randint(0, 255, (120, 160, 3)).astype(
                np.uint8)).save(f"{root}/backs/b{i}.png")

    store_p = PatchStore.load(root + "/cubes/train_xyz/01",
                              root + "/backs")
    store = DetectorStore.from_patch_stores({1: store_p}, store_p.backs)
    store = jax.tree_util.tree_map(lambda x: jax.device_put(x, accel),
                                   store)
    model = CenterNetDetector(num_classes=1)
    with jax.default_device(cpu):
        state = create_detector_state(jax.random.PRNGKey(0), model, 384)
    state = jax.device_put(state, accel)
    raw_step = make_detector_step(model)

    @jax.jit
    def step_fn(state, store, key, lr):
        batch = make_detector_batch(store, key, 8, 384)
        return raw_step(state, batch, lr)

    key = jax.device_put(jax.random.PRNGKey(1), accel)
    t0 = time.time()
    for it in range(args.steps):
        key, kb = jax.random.split(key)
        lr = 3e-4 * min(1.0, (it + 1) / 200)
        if it > args.steps * 0.8:
            lr = 1e-4
        state, parts = step_fn(state, store, kb, lr)
        if (it + 1) % 100 == 0:
            print(f"it{it} total={float(parts['total']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"{args.steps} steps in {time.time() - t0:.0f}s")

    det_vars = {"params": state.params, "batch_stats": state.stats}
    from pix2pose_tpu.inference.jax_detector import JaxDetector
    from synthetic import OracleGenerator
    from pix2pose_tpu.config import EvalConfig
    from pix2pose_tpu.eval import BopEvaluator
    from pix2pose_tpu.eval.metrics import evaluate_bop
    from pix2pose_tpu.inference import Pix2PoseEstimator

    jd = JaxDetector(model, det_vars, class_to_obj_id=[1], score_th=0.25,
                     input_size=384)
    ds_test = BopDataset(root + "_test", "cubes", train=False)
    omodel = OracleGenerator()
    with jax.default_device(cpu):
        params = omodel.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 128, 128, 3)))
    params = jax.device_put(params, accel)
    ecfg = EvalConfig(dataset_dir=root + "_test", score_type=2,
                      task_type=2, cand_factor=1.0,
                      outlier_th=(0.1, 0.2, 0.3), inlier_th=0.3)
    est = Pix2PoseEstimator(omodel, ecfg.estimator(0))
    obj_param = np.array([40., 40., 40., 0, 0, 0], np.float32)
    ev = BopEvaluator(ds_test, ecfg, est, {1: params}, {1: obj_param},
                      jd, max_det=4)
    results = ev.run()
    print("detector-driven results:", len(results))
    print("AR:", {k: round(v, 3) for k, v in
                  evaluate_bop(results, ds_test).items()
                  if k.startswith("AR")})


if __name__ == "__main__":
    main()
