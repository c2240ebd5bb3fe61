"""Bytes-moved roofline accounting for the training steps.

Round-4 verdict asked for the missing half of the "HBM-traffic-bound"
claim: a traffic budget showing whether the detector model step (59 ms
at batch 32 @ 384^2 bf16, 25.1% MFU) and the GAN step (21.8 ms at batch
32, 36-38% MFU) sit AT the v5e bandwidth roofline or merely below the
flops roofline.

Method: XLA's own post-fusion cost analysis of the COMPILED program
(``compiled.cost_analysis()``), which reports total flops and
"bytes accessed" = sum over fusions of operand + output bytes — i.e.
the HBM traffic the scheduler believes the program performs (on-chip
reuse within a fusion is already excluded; reuse ACROSS fusions that
hits in no cache is counted once per access, which is the right model
for v5e's HBM). Roofline time = max(flops / peak_flops,
bytes / peak_bw); the report compares that with the measured step time
and prints the implied bandwidth utilization.

    python tools/roofline.py detector   # raw model step b32 @384^2 bf16
    python tools/roofline.py gan        # GAN step b32, paper backbone

Run on the real TPU (axon) in a fresh process. The measured step times
quoted in the output are the completion-verified numbers from
tools/bench_train.py (docs/PARITY.md); this tool does not re-time.

v5e peaks: 197 TFLOP/s bf16 (utils/benchtime.py), 819 GB/s HBM
(public v5e spec).
"""

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

V5E_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def _cost(compiled):
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return dict(cost) if cost else {}


def _tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def _report(name, cost, extra_tensors, measured_ms):
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    t_flops_ms = flops / V5E_PEAK_FLOPS * 1e3
    t_bw_ms = byts / V5E_HBM_BYTES_PER_S * 1e3
    roof_ms = max(t_flops_ms, t_bw_ms)
    out = {
        "step": name,
        "flops": flops,
        "bytes_accessed": byts,
        "arith_intensity_flops_per_byte": round(flops / max(byts, 1), 2),
        "t_flops_ms": round(t_flops_ms, 2),
        "t_bandwidth_ms": round(t_bw_ms, 2),
        "roofline_ms": round(roof_ms, 2),
        "measured_ms": measured_ms,
        "measured_vs_roofline": round(measured_ms / roof_ms, 2),
        "implied_bw_util_pct": round(
            byts / (measured_ms / 1e3) / V5E_HBM_BYTES_PER_S * 100, 1),
        "implied_mfu_pct": round(
            flops / (measured_ms / 1e3) / V5E_PEAK_FLOPS * 100, 1),
        "bound": "bandwidth" if t_bw_ms > t_flops_ms else "flops",
        "state_tensors_bytes": extra_tensors,
    }
    print(json.dumps(out))
    return out


def main_detector():
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.training.detector_data import make_detector_batch
    from pix2pose_tpu.training.detector_train import (create_detector_state,
                                                      make_detector_step)
    from tools.bench_train import _synthetic_detector_store

    batch, im = 32, 384
    rng = np.random.RandomState(0)
    store = _synthetic_detector_store(rng)
    model = CenterNetDetector(num_classes=5, dtype=jnp.bfloat16)
    state = create_detector_state(jax.random.PRNGKey(0), model, im)
    step = jax.jit(make_detector_step(model), donate_argnums=(0,))
    batch_d = jax.jit(lambda k: make_detector_batch(
        store, k, batch, im, k_obj=8, stride=4))(jax.random.PRNGKey(1))
    cost = _cost(step.lower(state, batch_d, jnp.float32(2.5e-4)).compile())

    # the state tensors the step must stream regardless of the model math:
    # params read (fwd+bwd+adam) + written, adam m/v read+written, batch
    # read once, batch_stats negligible
    pb = _tree_bytes(state.params)
    ob = _tree_bytes(state.opt)
    bb = _tree_bytes(batch_d)
    extra = {
        "params_fp32": pb, "adam_mv_fp32": ob, "batch": bb,
        "floor_one_pass_each": pb * 2 + ob * 2 + bb,
    }
    _report("detector model step b32@384^2 bf16 (no pool/composer)",
            cost, extra, measured_ms=59.0)


def main_gan():
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import TrainConfig
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.training.gan import (create_train_state,
                                           make_train_step)

    cfg = TrainConfig(batch_size=32)
    gen, disc = AutoEncoder(), Discriminator()
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, cfg)
    step = jax.jit(make_train_step(gen, disc, cfg), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    b = cfg.batch_size
    batch = {
        "src": jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 3)),
                           jnp.float32),
        "tgt": jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 3)),
                           jnp.float32),
        "prob_gt": jnp.asarray(
            (rng.uniform(0, 1, (b, 128, 128, 1)) > 0.3), jnp.float32),
    }
    sym = jnp.eye(3)[None]
    cost = _cost(step.lower(state, batch, sym, jnp.float32(1e-3),
                            jax.random.PRNGKey(2)).compile())
    extra = {
        "gen_params_fp32": _tree_bytes(state.gen_params),
        "disc_params_fp32": _tree_bytes(state.disc_params),
        "batch": _tree_bytes(batch),
    }
    _report("GAN step b32 paper backbone", cost, extra, measured_ms=21.8)


def main_dump(mode):
    """Print every cost-analysis key (diagnostic)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (jnp.sin(x) @ x.T).sum())
    cost = _cost(f.lower(jnp.ones((256, 256))).compile())
    print(json.dumps({k: v for k, v in sorted(cost.items())}, indent=1))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "detector"
    if mode == "detector":
        main_detector()
    elif mode == "gan":
        main_gan()
    elif mode == "dump":
        main_dump(mode)
    else:
        raise SystemExit(f"unknown mode {mode}")
