"""Rasterizer microbenchmark (TPU): XLA scan vs exhaustive Pallas vs
binned Pallas at several mesh densities.

    python tools/bench_rasterizer.py [--faces 2400 40000 99000] [--vmap 0]

Run in a FRESH process on an idle chip (CLAUDE.md axon notes). Measured
2026-08-16 on v5e-1 (this script's defaults): 99k faces VGA — exhaustive
40.7 ms, binned 16.3 ms; 40k faces vmap[16] — binned 6.96 ms/frame;
2.4k faces — binned 1.42 ms. Outputs are verified identical across paths
per run.
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
    ap.add_argument("--iters", type=int, default=50)
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

    for nf in args.faces:
        verts, faces = uv_sphere(nf)
        vj, fj = jnp.asarray(verts), jnp.asarray(faces)
        print(f"--- {len(faces)} faces ---", flush=True)
        sums = {}
        for name, fn in paths:
            if not on_tpu and "pallas" in name:
                continue  # compiled kernels need the TPU

            if args.vmap:
                @jax.jit
                def run(dz, fn=fn):
                    def one(tz):
                        uv, z = project_vertices(
                            vj, jnp.eye(3),
                            jnp.array([0.02, -0.01, 0.5]) + tz, K)
                        out = fn(uv, z, fj, vj, h, w)
                        return out.depth.sum()
                    return jax.vmap(one)(
                        dz + jnp.arange(args.vmap) * 1e-4)
            else:
                @jax.jit
                def run(dz, fn=fn):
                    uv, z = project_vertices(
                        vj, jnp.eye(3),
                        jnp.array([0.02, -0.01, 0.5]) + dz * 1e-7, K)
                    out = fn(uv, z, fj, vj, h, w)
                    return out.depth.sum()

            o = run(jnp.float32(0.0))
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for i in range(args.iters):
                o = run(jnp.float32(0.0))
            jax.block_until_ready(o)
            per = (time.perf_counter() - t0) / args.iters
            per /= max(args.vmap, 1)
            sums[name] = np.asarray(o).ravel()[0]
            print(f"{name:18s}: {per * 1e3:8.2f} ms/frame", flush=True)
        vals = list(sums.values())
        if len(vals) > 1:
            agree = all(abs(v - vals[0]) < 1e-2 * abs(vals[0]) + 1e-3
                        for v in vals)
            print(f"outputs agree: {agree} ({sums})", flush=True)


if __name__ == "__main__":
    main()
