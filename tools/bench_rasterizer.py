"""Rasterizer microbenchmark (TPU): XLA scan vs exhaustive Pallas vs
binned Pallas at several mesh densities.

    python tools/bench_rasterizer.py [--faces 2400 40000 99000] [--vmap 0]

Timing is COMPLETION-VERIFIED (same methodology as bench.py): launches
are chained — launch i+1's camera translation carries a tiny offset
derived from launch i's depth-sum — and every timed window ends with a
4-byte host read of the carry, proving all launches in the window
executed. Plain dispatch-then-``block_until_ready`` windows through the
axon relay measure queueing, not compute (see bench.py's docstring and
the round-2 verdict), which is why the 2026-08-16 numbers recorded here
previously (16.3 ms @ 99k faces etc.) needed re-verification.

Run in a FRESH process on an idle chip (CLAUDE.md axon notes: the first
host read flips the process into the relay's degraded launch mode; this
script performs that flip BEFORE timing, so results are a lower bound on
device capability but are real throughput). Outputs are verified
identical across paths per run.
"""

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def uv_sphere(n_faces, r=0.05):
    n = max(int(np.sqrt(n_faces / 2)), 4)
    lat = np.linspace(0.12, np.pi - 0.12, n)
    lon = np.linspace(0, 2 * np.pi, n, endpoint=False)
    la, lo = np.meshgrid(lat, lon, indexing="ij")
    verts = np.stack([r * np.sin(la) * np.cos(lo),
                      r * np.sin(la) * np.sin(lo),
                      r * np.cos(la)], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    i = np.repeat(np.arange(n - 1), n)
    j = np.tile(np.arange(n), n - 1)
    j2 = (j + 1) % n
    f1 = np.stack([idx[i, j], idx[i + 1, j], idx[i, j2]], -1)
    f2 = np.stack([idx[i, j2], idx[i + 1, j], idx[i + 1, j2]], -1)
    return verts, np.concatenate([f1, f2]).astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", type=int, nargs="+",
                    default=[2400, 40000, 99000])
    ap.add_argument("--vmap", type=int, default=0,
                    help="batch renders under vmap[B] (0 = unbatched)")
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--k", type=int, default=10,
                    help="chained launches per timed window")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.ops.rasterizer import project_vertices, rasterize
    from pix2pose_tpu.ops.rasterizer_pallas import (
        rasterize_pallas, rasterize_pallas_binned)

    h, w = 480, 640
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    on_tpu = jax.default_backend() not in ("cpu",)
    paths = [("xla-scan", rasterize),
             ("pallas-exhaustive", rasterize_pallas),
             ("pallas-binned", rasterize_pallas_binned)]

    # flip the relay read path before any timing (CLAUDE.md pathology 1)
    _ = np.asarray(jax.device_put(np.zeros((1,), np.float32)))

    for nf in args.faces:
        verts, faces = uv_sphere(nf)
        vj, fj = jnp.asarray(verts), jnp.asarray(faces)
        print(f"--- {len(faces)} faces ---", flush=True)
        sums = {}
        for name, fn in paths:
            if not on_tpu and "pallas" in name:
                continue  # compiled kernels need the TPU

            def step(carry, fn=fn):
                # launch chaining: a sub-micron z offset derived from the
                # previous launch's depth sum makes every launch depend on
                # the one before it, so the final carry read proves the
                # whole window executed
                eps = (carry % 997).astype(jnp.float32) * 1e-9

                def one(tz):
                    uv, z = project_vertices(
                        vj, jnp.eye(3),
                        jnp.array([0.02, -0.01, 0.5]) + tz + eps, K)
                    out = fn(uv, z, fj, vj, h, w)
                    return out.depth.sum()

                if args.vmap:
                    s = jnp.sum(jax.vmap(one)(
                        jnp.arange(args.vmap) * 1e-4))
                else:
                    s = one(jnp.float32(0.0))
                new_carry = ((jnp.abs(s) * 1e3).astype(jnp.int32)
                             + carry) % 1000003
                return new_carry, s

            compiled = jax.jit(step).lower(jnp.int32(0)).compile()
            carry, s = compiled(jnp.int32(0))
            sums[name] = float(np.asarray(s))  # warmup launch + forced read
            frames = max(args.vmap, 1) * args.k
            per_frame = []
            for _w in range(args.windows):
                t0 = time.perf_counter()
                for _ in range(args.k):
                    carry, s = compiled(carry)
                _ = int(np.asarray(carry))  # completion proof
                dt = time.perf_counter() - t0
                per_frame.append(dt / frames)
            per_frame.sort()
            per = per_frame[len(per_frame) // 2]
            print(f"{name:18s}: {per * 1e3:8.2f} ms/frame "
                  f"(windows {[round(p * 1e3, 2) for p in per_frame]})",
                  flush=True)
        vals = list(sums.values())
        if len(vals) > 1:
            agree = all(abs(v - vals[0]) < 1e-2 * abs(vals[0]) + 1e-3
                        for v in vals)
            print(f"outputs agree: {agree} ({sums})", flush=True)


if __name__ == "__main__":
    main()
