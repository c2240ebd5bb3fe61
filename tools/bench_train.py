"""Completion-verified training-step benchmarks (TPU).

    python tools/bench_train.py gan          # paper backbone, batch 50
    python tools/bench_train.py gan-32       # paper backbone, batch 32
    python tools/bench_train.py gan-resnet   # resnet50 backbone, batch 50
    python tools/bench_train.py detector     # CenterNet, batch 8 @ 384^2
    python tools/bench_train.py multi-4      # fused 4-object GAN step
                                             # (training/multi.py), batch 32

Each mode times the EXACT fused program the trainers dispatch — on-device
batch synthesis (training/data.make_batch or detector_data.
make_detector_batch) + the full train step (disc x2 + gen update for the
GAN, fwd+bwd+adam for the detector) — with the chained-carry methodology
of utils/benchtime.py: launch i+1's PRNG key derives from launch i's
carry, the carry reduces over EVERY leaf of the updated train state (so
no part of the update is dead-code-eliminated), and each timed window
ends with a host read of the carry.

The pre-round-3 figures (15 ms/step GAN batch 32, 3 ms/step detector)
were measured with the discredited dispatch-then-block pattern; this tool
re-establishes them honestly. The headline value is the steady-state
chained-window median (benchtime.bench_chained). A cold-chain figure
(benchtime.bench_virgin: no host read before a single timed chain) is
reported too — it bounds first-execution cost (program upload) and,
for gather-heavy programs, the relay's fast-dispatch mode; with the
banded-matmul warp the steady numbers no longer depend on the relay
mode (the 2026-08-18 gather-era composer measured ~931 ms/step in BOTH
modes; the matmul warp took the steady step to ~40 ms). Run on an idle
chip, one mode per process:

    for m in gan gan-32 detector; do python tools/bench_train.py $m; done
"""

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def _checksum(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
        tree, jnp.float32(0.0))


def _carry_out(carry, salt, chk):
    import jax.numpy as jnp

    # data-dependent but value-bounded: the cast keeps the dependency on
    # every updated leaf without letting the carry overflow
    return (carry + salt + (jnp.nan_to_num(chk) * 1e-20).astype(
        jnp.int32)) % 1000003


def _synthetic_patch_store(rng, n=64, n_back=16):
    import jax

    from pix2pose_tpu.training.data import PatchStore

    mask = np.zeros((n, 128, 128), bool)
    mask[:, 24:104, 24:104] = True
    return PatchStore(
        rgb=jax.device_put(rng.randint(0, 255, (n, 128, 128, 3)).astype(
            np.uint8)),
        xyz=jax.device_put(rng.randint(0, 255, (n, 128, 128, 3)).astype(
            np.uint8)),
        mask=jax.device_put(mask),
        extent=jax.device_put(np.full((n,), 80.0, np.float32)),
        backs=jax.device_put(rng.randint(0, 255, (n_back, 256, 256,
                                                  3)).astype(np.uint8)))


def bench_gan(backbone: str, batch: int, compute_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import TrainConfig
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.training.data import make_batch
    from pix2pose_tpu.training.gan import (create_train_state,
                                           make_train_step)
    from pix2pose_tpu.utils.benchtime import bench_chained, bench_virgin

    cfg = TrainConfig(batch_size=batch, backbone=backbone,
                      compute_dtype=compute_dtype)
    gen = AutoEncoder(backbone=backbone, dtype=cfg.jnp_dtype)
    disc = Discriminator(dtype=cfg.jnp_dtype)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, cfg)
    raw_step = make_train_step(gen, disc, cfg)
    store = _synthetic_patch_store(np.random.RandomState(0))
    sym = jnp.eye(3)[None]
    lr = jnp.float32(1e-4)

    def step(state, store, sym, lr, carry, salt):
        key = jax.random.fold_in(jax.random.PRNGKey(7),
                                 carry * 8191 + salt)
        kb, ks = jax.random.split(key)
        batch_d = make_batch(store, kb, salt, cfg.batch_size)
        new_state, metrics = raw_step(state, batch_d, sym, lr, ks)
        return _carry_out(carry, salt,
                          _checksum(new_state) + _checksum(metrics))

    rc = bench_virgin(step, (state, store, sym, lr), 1)
    r = bench_chained(step, (state, store, sym, lr), 1)
    return {
        "metric": f"GAN train step ms (fused data synthesis, {backbone} "
                  f"backbone, batch {batch}, {compute_dtype}, "
                  f"completion-verified)",
        "value": round(r["launch_ms"], 2), "unit": "ms/step",
        "steps_per_s": round(r["units_per_s"], 2),
        "implied_mfu_pct": (round(r["implied_mfu_pct"], 2)
                            if r["implied_mfu_pct"] is not None else None),
        "flops_per_step": r["flops_per_launch"],
        "cold_chain_ms": round(rc["launch_ms"], 2),
    }


def bench_multi(k_obj: int, backbone: str = "paper", batch: int = 32):
    """Fused K-object GAN step (training/multi.py) — one launch trains K
    networks; compare ms/step against k_obj x the single-object `gan-32`
    number to quantify the fusion win over the reference's sequential
    train.sh loop."""
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import TrainConfig
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.training.gan import create_train_state
    from pix2pose_tpu.training.multi import (make_multi_step, stack_states,
                                             stack_stores, stack_sym_pools)
    from pix2pose_tpu.utils.benchtime import bench_chained, bench_virgin

    cfg = TrainConfig(batch_size=batch, backbone=backbone)
    gen, disc = AutoEncoder(backbone=backbone), Discriminator()
    states = [create_train_state(jax.random.PRNGKey(o), gen, disc, cfg)
              for o in range(k_obj)]
    stacked = stack_states(states)
    rng = np.random.RandomState(0)
    store, n_valid = stack_stores(
        [_synthetic_patch_store(rng) for _ in range(k_obj)])
    pools = stack_sym_pools([np.eye(3, dtype=np.float32)[None]] * k_obj)
    full_rot = jnp.ones((k_obj,), bool)
    lr = jnp.float32(1e-4)
    raw = make_multi_step(gen, disc, cfg)

    def step(stacked, store, n_valid, full_rot, pools, lr, carry, salt):
        key = jax.random.fold_in(jax.random.PRNGKey(7),
                                 carry * 8191 + salt)
        keys = jax.random.split(key, k_obj)
        new_state, metrics = raw(stacked, store, n_valid, full_rot, pools,
                                 salt, lr, keys)
        return _carry_out(carry, salt,
                          _checksum(new_state) + _checksum(metrics))

    args = (stacked, store, n_valid, full_rot, pools, lr)
    rc = bench_virgin(step, args, 1)
    r = bench_chained(step, args, 1)
    return {
        "metric": f"fused {k_obj}-object GAN train step ms ({backbone} "
                  f"backbone, batch {batch}/object, completion-verified)",
        "value": round(r["launch_ms"], 2), "unit": "ms/step",
        "object_steps_per_s": round(r["units_per_s"] * k_obj, 2),
        "ms_per_object_step": round(r["launch_ms"] / k_obj, 2),
        "implied_mfu_pct": (round(r["implied_mfu_pct"], 2)
                            if r["implied_mfu_pct"] is not None else None),
        "flops_per_step": r["flops_per_launch"],
        "cold_chain_ms": round(rc["launch_ms"], 2),
    }


def _synthetic_detector_store(rng, n=64):
    import jax

    from pix2pose_tpu.training.detector_data import DetectorStore

    mask = np.zeros((n, 128, 128), bool)
    mask[:, 24:104, 24:104] = True
    return DetectorStore(
        rgb=jax.device_put(rng.randint(0, 255, (n, 128, 128, 3)).astype(
            np.uint8)),
        mask=jax.device_put(mask),
        label=jax.device_put((np.arange(n) % 5).astype(np.int32)),
        extent=jax.device_put(np.full((n,), 80.0, np.float32)),
        backs=jax.device_put(rng.randint(0, 255, (16, 256, 256, 3)).astype(
            np.uint8)),
        num_classes=5)


def bench_detector(batch: int = 8, im_size: int = 384,
                   compute_dtype: str = "float32",
                   data_only: bool = False):
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.training.detector_data import make_detector_batch
    from pix2pose_tpu.training.detector_train import (create_detector_state,
                                                      make_detector_step)
    from pix2pose_tpu.utils.benchtime import bench_chained, bench_virgin

    rng = np.random.RandomState(0)
    store = _synthetic_detector_store(rng)
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    model = CenterNetDetector(num_classes=5, dtype=dtype)
    state = create_detector_state(jax.random.PRNGKey(0), model, im_size)
    raw_step = make_detector_step(model)
    lr = jnp.float32(2.5e-4)

    def step(state, store, lr, carry, salt):
        key = jax.random.fold_in(jax.random.PRNGKey(7),
                                 carry * 8191 + salt)
        batch_d = make_detector_batch(store, key, batch, im_size)
        if data_only:  # attribution: composer + target splat alone
            return _carry_out(carry, salt, _checksum(batch_d))
        new_state, parts = raw_step(state, batch_d, lr)
        return _carry_out(carry, salt,
                          _checksum(new_state) + _checksum(parts))

    rc = bench_virgin(step, (state, store, lr), 1)
    r = bench_chained(step, (state, store, lr), 1)
    what = "scene synthesis ONLY" if data_only else "fused scene synthesis"
    return {
        "metric": f"CenterNet detector train step ms ({what}, "
                  f"batch {batch} @ {im_size}^2, {compute_dtype}, "
                  f"completion-verified)",
        "value": round(r["launch_ms"], 2), "unit": "ms/step",
        "steps_per_s": round(r["units_per_s"], 2),
        "implied_mfu_pct": (round(r["implied_mfu_pct"], 2)
                            if r["implied_mfu_pct"] is not None else None),
        "flops_per_step": r["flops_per_launch"],
        "cold_chain_ms": round(rc["launch_ms"], 2),
    }


def bench_detector_pooled(batch: int = 32, im_size: int = 384,
                          compute_dtype: str = "bfloat16",
                          pool_size: int = 256, fresh: int = 4,
                          refresh_every: int = 4, shared_head: int = 0,
                          old_model: bool = False,
                          trunk_remat: bool = False):
    """Scene-pool train step (make_pooled_detector_step). Timing is
    completion-verified by construction: every launch consumes the
    previous launch's donated state AND pool, so the chain cannot
    overlap; the window read at the end forces the whole chain.

    The timed window (8 steps) is a multiple of refresh_every, so the
    reported ms/step averages refresh and non-refresh steps at their
    true ratio. XLA's cost analysis counts BOTH lax.cond branches (the
    composer chunk would be billed every step though it runs every
    refresh_every-th), so the composer chunk is cost-analyzed on its
    own and amortized: flops_per_step = (cond_program - chunk_compose)
    + chunk_compose / refresh_every."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.training.detector_train import (
        create_detector_state, make_pooled_detector_step)
    from pix2pose_tpu.utils.benchtime import V5E_BF16_PEAK_FLOPS

    rng = np.random.RandomState(0)
    store = _synthetic_detector_store(rng)
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    model = CenterNetDetector(num_classes=5, dtype=dtype,
                              shared_head_dim=shared_head,
                              fused_heads=not old_model,
                              stem_s2d=not old_model,
                              trunk_remat=trunk_remat)
    state = create_detector_state(jax.random.PRNGKey(0), model, im_size)
    init_pool, step_fn = make_pooled_detector_step(
        model, pool_size, batch, im_size, fresh_per_step=fresh,
        refresh_every=refresh_every)
    pool = init_pool(store, jax.random.PRNGKey(3))
    lr = jnp.float32(2.5e-4)

    def _flops_of(compiled):
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", -1.0)) if cost else -1.0

    flops = _flops_of(step_fn.lower(state, store, pool, jnp.int32(0),
                                    jax.random.PRNGKey(9), lr).compile())
    # Amortize the composer chunk (executed 1/refresh_every steps but
    # present in the cond program's cost analysis every step).
    from pix2pose_tpu.training.detector_data import (make_detector_batch,
                                                     pack_detector_batch)
    chunk = fresh * refresh_every

    @jax.jit
    def _compose_chunk(store, key):
        return pack_detector_batch(make_detector_batch(
            store, key, chunk, im_size, k_obj=8, stride=4,
            scale_range=(0.6, 1.6)))

    compose_flops = _flops_of(
        _compose_chunk.lower(store, jax.random.PRNGKey(9)).compile())
    if flops > 0 and compose_flops > 0:
        flops = (flops - compose_flops
                 + compose_flops / refresh_every)

    it = 0

    def run(k_steps):
        nonlocal state, pool, it
        key = jax.random.PRNGKey(100 + it)
        for _ in range(k_steps):
            key, ks = jax.random.split(key)
            state, pool, parts = step_fn(state, store, pool,
                                         jnp.int32(it), ks, lr)
            it += 1
        return float(np.asarray(parts["total"]))  # forces the chain

    run(2)  # warmup (donation steady-state)
    # The timed window must cover a whole refresh period or the median
    # window under-represents refresh steps (at refresh_every=16 an
    # 8-step window contains a refresh only half the time).
    win = refresh_every * max(1, -(-8 // refresh_every))  # lcm-ish
    it = win * ((it + win - 1) // win)  # align windows to refresh phase
    rates = []
    for _w in range(4):
        t0 = _time.perf_counter()
        run(win)
        rates.append(win / (_time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    mfu = med * flops / V5E_BF16_PEAK_FLOPS * 100.0 if flops > 0 else None
    if mfu is not None and mfu > 100.0:
        raise SystemExit("REFUSING impossible result (> chip peak)")
    return {
        "metric": f"CenterNet detector train step ms (scene pool "
                  f"{pool_size}/fresh {fresh}/refresh_every "
                  f"{refresh_every}, batch {batch} @ {im_size}^2, "
                  f"{compute_dtype}"
                  + (f", shared_head {shared_head}" if shared_head
                     else "")
                  + (", pre-round-4 model" if old_model else "")
                  + (", trunk remat" if trunk_remat else "")
                  + ", completion-verified)",
        "value": round(1e3 / med, 2), "unit": "ms/step",
        "steps_per_s": round(med, 2),
        "implied_mfu_pct": round(mfu, 2) if mfu is not None else None,
        "flops_per_step": flops,
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "gan"
    if mode == "gan":
        out = bench_gan("paper", 50)
    elif mode == "gan-32":
        out = bench_gan("paper", 32)
    elif mode == "gan-bf16":
        out = bench_gan("paper", 50, compute_dtype="bfloat16")
    elif mode == "gan-32-bf16":
        out = bench_gan("paper", 32, compute_dtype="bfloat16")
    elif mode == "gan-resnet":
        out = bench_gan("resnet50", 50)
    elif mode == "detector":
        out = bench_detector()
    elif mode == "detector-data":
        out = bench_detector(data_only=True)
    elif mode.startswith("detector-"):
        # detector-<batch>[-bf16][-pool][-shared][-oldmodel][-rN],
        # e.g. detector-32-bf16-pool-r8
        parts = mode.split("-")[1:]
        cd = "bfloat16" if "bf16" in parts else "float32"
        refresh = next((int(p[1:]) for p in parts
                        if p.startswith("r") and p[1:].isdigit()), 4)
        if "pool" in parts:
            out = bench_detector_pooled(
                batch=int(parts[0]), compute_dtype=cd,
                refresh_every=refresh,
                shared_head=256 if "shared" in parts else 0,
                old_model="oldmodel" in parts,
                trunk_remat="remat" in parts)
        else:
            out = bench_detector(batch=int(parts[0]), compute_dtype=cd)
    elif mode.startswith("multi-"):
        out = bench_multi(int(mode.split("-", 1)[1]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    import jax

    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
