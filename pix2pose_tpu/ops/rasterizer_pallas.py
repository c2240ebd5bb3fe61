"""Pallas TPU rasterizer core.

The XLA rasterizer (:mod:`pix2pose_tpu.ops.rasterizer`) carries the
z-buffer through a ``lax.scan`` over face chunks — correct, but the carry
round-trips HBM every chunk. These kernels keep each pixel tile's
depth buffer, winning-face index and barycentrics resident in VMEM for
the whole face loop (the accumulation-across-grid pattern: the output
BlockSpec revisits the same block in place), and only the final tile is
written out. Attribute interpolation happens outside the kernel as an
XLA gather over the winning face indices.

Hot-loop design: per-face barycentrics and interpolated 1/z are
precomputed host-side as affine coefficients in the pixel coordinates
(``_sorted_tris``), so the per-pixel work is three fused
multiply-adds + a 3-way coverage test + a running max on 1/z — no
division anywhere in the loop (the depth test on 1/z replaces the z-min;
``1/z`` is inverted once in the epilogue). Faces are spatially sorted by
centroid tile; two drivers share the kernel body:

- :func:`rasterize_pallas` — exhaustive tiles x chunks grid with a
  chunk-bbox skip. Best for small meshes.
- :func:`rasterize_pallas_binned` — a flat (tile, chunk) work list
  driven through ``PrefetchScalarGridSpec``; grid steps scale with
  actual overlap instead of the full product (~3x faster at 100k faces
  VGA, bit-identical output).

This replaces the CUDA kernel's atomicMin z-buffer discipline
(``rendering/gpu_render.py:26-93``) with a race-free max-reduction
(SURVEY.md §5.2). Falls back to interpret mode off-TPU, so the same code
runs in CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops.rasterizer import RenderOut, project_vertices

TILE_V = 16
TILE_U = 128
FACE_CHUNK = 128


def _kernel(tri_ref, bounds_ref, out_z_ref, out_f_ref, out_a_ref,
            out_b_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    tv = pl.program_id(0)
    tu = pl.program_id(1)
    kc = pl.program_id(2)

    @pl.when(kc == 0)
    def _init():
        # z-buffer carries interpolated 1/z; 0 = background
        out_z_ref[:] = jnp.zeros((TILE_V, TILE_U), jnp.float32)
        out_f_ref[:] = jnp.full((TILE_V, TILE_U), -1, jnp.int32)
        out_a_ref[:] = jnp.zeros((TILE_V, TILE_U), jnp.float32)
        out_b_ref[:] = jnp.zeros((TILE_V, TILE_U), jnp.float32)

    # chunk-level binning: skip this face chunk entirely when its screen
    # bbox cannot touch the tile (bounds_ref: v_min, v_max, u_min, u_max)
    t_v0 = (tv * TILE_V).astype(jnp.float32)
    t_u0 = (tu * TILE_U).astype(jnp.float32)
    overlap = ((bounds_ref[kc, 1] >= t_v0)
               & (bounds_ref[kc, 0] <= t_v0 + (TILE_V - 1))
               & (bounds_ref[kc, 3] >= t_u0)
               & (bounds_ref[kc, 2] <= t_u0 + (TILE_U - 1)))

    @pl.when(overlap)
    def _rasterize_chunk():
        _chunk_body(tri_ref, out_z_ref, out_f_ref, out_a_ref, out_b_ref,
                    tv, tu, kc)


def _chunk_body(tri_ref, out_z_ref, out_f_ref, out_a_ref, out_b_ref,
                tv, tu, kc):
    import jax.numpy as jnp

    pv = (jax.lax.broadcasted_iota(jnp.int32, (TILE_V, TILE_U), 0)
          .astype(jnp.float32) + tv * TILE_V)
    pu = (jax.lax.broadcasted_iota(jnp.int32, (TILE_V, TILE_U), 1)
          .astype(jnp.float32) + tu * TILE_U)

    izbuf = out_z_ref[:]
    fbuf = out_f_ref[:]
    abuf = out_a_ref[:]
    bbuf = out_b_ref[:]

    UNROLL = 8

    def one_face(f, carry):
        izbuf, fbuf, abuf, bbuf = carry
        # per-face affine coefficients precomputed host-side
        # (``_sorted_tris``); scalars live in SMEM — dynamic scalar reads
        # are the supported pattern there. The loop body has no division:
        # the depth test runs on interpolated 1/z (max instead of min).
        ca_u, ca_v, ca_0 = tri_ref[0, f], tri_ref[1, f], tri_ref[2, f]
        cb_u, cb_v, cb_0 = tri_ref[3, f], tri_ref[4, f], tri_ref[5, f]
        cz_u, cz_v, cz_0 = tri_ref[6, f], tri_ref[7, f], tri_ref[8, f]
        a = ca_u * pu + ca_v * pv + ca_0
        b = cb_u * pu + cb_v * pv + cb_0
        c = 1.0 - a - b
        # a <= 1 etc. are implied by the two other weights being >= 0
        cover = (a >= 0) & (b >= 0) & (c >= 0)
        izi = cz_u * pu + cz_v * pv + cz_0
        cand = jnp.where(cover, izi, -1.0)
        better = cand > izbuf
        fid = kc * FACE_CHUNK + f
        return (jnp.where(better, cand, izbuf),
                jnp.where(better, fid, fbuf),
                jnp.where(better, a, abuf),
                jnp.where(better, b, bbuf))

    def face_body(g, carry):
        # manual unroll (Mosaic's fori_loop only supports unroll=1|full)
        f0 = g * UNROLL
        for k in range(UNROLL):
            carry = one_face(f0 + k, carry)
        return carry

    izbuf, fbuf, abuf, bbuf = jax.lax.fori_loop(
        0, FACE_CHUNK // UNROLL, face_body, (izbuf, fbuf, abuf, bbuf))
    out_z_ref[:] = izbuf
    out_f_ref[:] = fbuf
    out_a_ref[:] = abuf
    out_b_ref[:] = bbuf


def _sorted_tris(uv, z, faces, h: int, w: int):
    """Pad to FACE_CHUNK, gather per-face screen coords, spatially sort
    by centroid tile, and precompute the per-face affine coefficients the
    kernel evaluates per pixel (barycentrics a and b, and interpolated
    1/z, each as ``c_u * pu + c_v * pv + c_0``). Degenerate, padded and
    behind-camera faces get coefficients that always fail coverage.
    Returns (packed (9, fp), sorted faces, per-chunk pixel bounds
    (n_chunks, 4), n_chunks)."""
    f = faces.shape[0]
    pad = (-f) % FACE_CHUNK
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), jnp.int32)], axis=0)
    fp = faces.shape[0]
    # invalidate padded faces by zero depth
    valid_face = jnp.arange(fp) < f
    tri_v = uv[faces[:, :], 1]  # (fp, 3)
    tri_u = uv[faces[:, :], 0]
    tri_z = jnp.where(valid_face[:, None], z[faces[:, :]], -1.0)

    # spatial sort: order faces by the screen tile of their centroid so
    # each chunk's bbox is tight and tile-level binning prunes
    # aggressively regardless of mesh ordering
    n_tu = w // TILE_U
    cv = jnp.clip(tri_v.mean(1), 0.0, h - 1.0)
    cu = jnp.clip(tri_u.mean(1), 0.0, w - 1.0)
    bin_id = (jnp.floor(cv / TILE_V) * n_tu
              + jnp.floor(cu / TILE_U)).astype(jnp.int32)
    bin_id = jnp.where(valid_face, bin_id, jnp.int32(2 ** 30))
    order = jnp.argsort(bin_id)
    tri_v = tri_v[order]
    tri_u = tri_u[order]
    tri_z = tri_z[order]
    faces = faces[order]
    valid_face = valid_face[order]

    # affine coefficients: barycentric a (vertex 1 weight) and b
    # (vertex 2) as functions of pixel coords (pu, pv), same math as the
    # XLA rasterizer's per-pixel form, expanded:
    #   a = ((v2-v3)(pu-u3) + (u3-u2)(pv-v3)) / den
    v1, v2, v3 = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]
    u1, u2, u3 = tri_u[:, 0], tri_u[:, 1], tri_u[:, 2]
    z1, z2, z3 = tri_z[:, 0], tri_z[:, 1], tri_z[:, 2]
    den = (v2 - v3) * (u1 - u3) + (u3 - u2) * (v1 - v3)
    ok = valid_face & (jnp.abs(den) > 1e-12) & (z1 > 0) & (z2 > 0) \
        & (z3 > 0)
    den = jnp.where(ok, den, 1.0)
    ca_u = (v2 - v3) / den
    ca_v = (u3 - u2) / den
    ca_0 = -(ca_u * u3 + ca_v * v3)
    cb_u = (v3 - v1) / den
    cb_v = (u1 - u3) / den
    cb_0 = -(cb_u * u3 + cb_v * v3)
    iz1 = 1.0 / jnp.maximum(z1, 1e-9)
    iz2 = 1.0 / jnp.maximum(z2, 1e-9)
    iz3 = 1.0 / jnp.maximum(z3, 1e-9)
    cz_u = ca_u * (iz1 - iz3) + cb_u * (iz2 - iz3)
    cz_v = ca_v * (iz1 - iz3) + cb_v * (iz2 - iz3)
    cz_0 = iz3 + ca_0 * (iz1 - iz3) + cb_0 * (iz2 - iz3)
    # invalid faces: a == -1 everywhere -> coverage always fails
    zero = jnp.zeros_like(ca_u)
    ca_u, ca_v = jnp.where(ok, ca_u, zero), jnp.where(ok, ca_v, zero)
    ca_0 = jnp.where(ok, ca_0, -1.0)
    cb_u, cb_v = jnp.where(ok, cb_u, zero), jnp.where(ok, cb_v, zero)
    cb_0 = jnp.where(ok, cb_0, zero)
    cz_u, cz_v = jnp.where(ok, cz_u, zero), jnp.where(ok, cz_v, zero)
    cz_0 = jnp.where(ok, cz_0, zero)
    # pack (9, fp): rows ca_u ca_v ca_0 cb_u cb_v cb_0 cz_u cz_v cz_0
    packed = jnp.stack([ca_u, ca_v, ca_0, cb_u, cb_v, cb_0,
                        cz_u, cz_v, cz_0], axis=0)

    n_chunks = fp // FACE_CHUNK
    # per-chunk screen bounds (invalid faces must not widen them)
    big = jnp.float32(1e9)
    vmin = jnp.where(valid_face[:, None], tri_v, big).min(1)
    vmax = jnp.where(valid_face[:, None], tri_v, -big).max(1)
    umin = jnp.where(valid_face[:, None], tri_u, big).min(1)
    umax = jnp.where(valid_face[:, None], tri_u, -big).max(1)
    cs = lambda a, red: red(a.reshape(n_chunks, FACE_CHUNK), axis=1)
    bounds = jnp.stack([cs(vmin, jnp.min), cs(vmax, jnp.max),
                        cs(umin, jnp.min), cs(umax, jnp.max)],
                       axis=1)  # (n_chunks, 4)
    return packed, faces, bounds, n_chunks


def _attr_epilogue(izb, fidx, ba, bb, faces, z, attrs,
                   overflow=0) -> RenderOut:
    """Perspective-correct attribute interpolation from winning faces
    (an XLA gather — outside the kernel on purpose). ``izb`` is the
    kernel's interpolated-1/z buffer (0 = background)."""
    mask = izb > 0
    depth = jnp.where(mask, 1.0 / jnp.maximum(izb, 1e-12), 0.0)
    fidx_c = jnp.maximum(fidx, 0)
    fv = faces[fidx_c]  # (h, w, 3)
    fa = attrs[fv]      # (h, w, 3, C)
    fz = jnp.maximum(z[fv], 1e-9)  # (h, w, 3)
    cw = 1.0 - ba - bb
    wsum = (ba / fz[..., 0] + bb / fz[..., 1] + cw / fz[..., 2])
    attr = (fa[..., 0, :] * (ba / fz[..., 0])[..., None]
            + fa[..., 1, :] * (bb / fz[..., 1])[..., None]
            + fa[..., 2, :] * (cw / fz[..., 2])[..., None]) \
        / jnp.maximum(wsum, 1e-12)[..., None]
    attr = jnp.where(mask[..., None], attr, 0.0)
    return RenderOut(depth=depth, attr=attr, mask=mask, overflow=overflow)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "interpret"))
def rasterize_pallas(uv, z, faces, attrs, h: int, w: int,
                     interpret: bool = False) -> RenderOut:
    """Pallas-core rasterization; same contract as
    :func:`pix2pose_tpu.ops.rasterizer.rasterize` (full-frame, v0=u0=0).

    ``h`` and ``w`` must be multiples of the tile size (16, 128).

    Exhaustive grid: every (pixel tile, face chunk) pair is a grid step;
    non-overlapping pairs are skipped by a chunk-bbox test but still pay
    grid-step overhead — O(tiles x faces/128) steps. Preferred for small
    meshes; see :func:`rasterize_pallas_binned` for the work-list variant
    that scales to large meshes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if h % TILE_V or w % TILE_U:
        raise ValueError(f"(h={h}, w={w}) must tile by "
                         f"({TILE_V}, {TILE_U})")
    uv = jnp.asarray(uv, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    attrs = jnp.asarray(attrs, jnp.float32)

    packed, faces, bounds, n_chunks = _sorted_tris(uv, z, faces, h, w)
    grid = (h // TILE_V, w // TILE_U, n_chunks)

    out_shapes = (
        jax.ShapeDtypeStruct((h, w), jnp.float32),   # z
        jax.ShapeDtypeStruct((h, w), jnp.int32),     # face idx
        jax.ShapeDtypeStruct((h, w), jnp.float32),   # bary a
        jax.ShapeDtypeStruct((h, w), jnp.float32),   # bary b
    )
    tile_spec = pl.BlockSpec((TILE_V, TILE_U),
                             lambda tv, tu, kc: (tv, tu))
    zb, fidx, ba, bb = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((9, FACE_CHUNK),
                               lambda tv, tu, kc: (0, kc),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],  # full bounds
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=out_shapes,
        interpret=interpret,
    )(packed, bounds)
    return _attr_epilogue(zb, fidx, ba, bb, faces, z, attrs)


# ------------------------------------------------- binned (work-list) path
PAIR_FLAG_PAD = 0
PAIR_FLAG_INIT = 1
PAIR_FLAG_WORK = 2


def _binned_kernel(tv_ref, tu_ref, pc_ref, pf_ref, tri_ref, out_z_ref,
                   out_f_ref, out_a_ref, out_b_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    flag = pf_ref[i]

    @pl.when(flag == PAIR_FLAG_INIT)
    def _init():
        # z-buffer carries interpolated 1/z; 0 = background
        out_z_ref[:] = jnp.zeros((TILE_V, TILE_U), jnp.float32)
        out_f_ref[:] = jnp.full((TILE_V, TILE_U), -1, jnp.int32)
        out_a_ref[:] = jnp.zeros((TILE_V, TILE_U), jnp.float32)
        out_b_ref[:] = jnp.zeros((TILE_V, TILE_U), jnp.float32)

    @pl.when(flag == PAIR_FLAG_WORK)
    def _work():
        _chunk_body(tri_ref, out_z_ref, out_f_ref, out_a_ref, out_b_ref,
                    tv_ref[i], tu_ref[i], pc_ref[i])


def _build_pairs(bounds, n_tv: int, n_tu: int, n_pairs: int):
    """Flat (tile, chunk) work list, tile-sorted, with init/pad entries.

    Entry i carries ``(pair_tv, pair_tu, pair_chunk, pair_flag)``. Every
    tile gets exactly one INIT entry; each chunk gets one WORK entry per
    screen tile its bbox overlaps (built with searchsorted gathers — no
    scatters). Sorted so a tile's INIT entry immediately precedes its
    WORK entries, keeping the output block resident in VMEM for the whole
    run. WORK entries beyond the static capacity are dropped (see
    ``rasterize_pallas_binned``'s ``pair_factor``).
    """
    n_tiles = n_tv * n_tu
    n_chunks = bounds.shape[0]
    # chunk bbox -> tile-index bbox; empty/off-screen chunks get negative
    # spans (clamp handles +-1e9 sentinel bounds)
    ctv0 = jnp.clip(jnp.floor(bounds[:, 0] / TILE_V), 0, n_tv - 1)
    ctv1 = jnp.clip(jnp.floor(bounds[:, 1] / TILE_V), 0, n_tv - 1)
    ctu0 = jnp.clip(jnp.floor(bounds[:, 2] / TILE_U), 0, n_tu - 1)
    ctu1 = jnp.clip(jnp.floor(bounds[:, 3] / TILE_U), 0, n_tu - 1)
    off = (bounds[:, 1] < 0) | (bounds[:, 0] > jnp.float32(n_tv * TILE_V - 1)) \
        | (bounds[:, 3] < 0) | (bounds[:, 2] > jnp.float32(n_tu * TILE_U - 1)) \
        | (bounds[:, 0] > bounds[:, 1])  # empty chunk sentinel
    ctv0, ctv1 = ctv0.astype(jnp.int32), ctv1.astype(jnp.int32)
    ctu0, ctu1 = ctu0.astype(jnp.int32), ctu1.astype(jnp.int32)
    span_v = jnp.where(off, 0, ctv1 - ctv0 + 1)
    span_u = jnp.where(off, 0, ctu1 - ctu0 + 1)
    per_chunk = span_v * span_u                      # (n_chunks,)
    cum = jnp.cumsum(per_chunk)                      # inclusive
    total = cum[-1]

    # work entries by gather: pair p belongs to chunk c(p)
    p = jnp.arange(n_pairs, dtype=jnp.int32)
    c = jnp.searchsorted(cum, p, side="right").astype(jnp.int32)
    c = jnp.minimum(c, n_chunks - 1)
    k = p - (cum[c] - per_chunk[c])                  # rank within chunk
    su = jnp.maximum(span_u[c], 1)
    w_tv = ctv0[c] + k // su
    w_tu = ctu0[c] + k % su
    w_valid = p < total
    w_tile = w_tv * n_tu + w_tu

    # init entries: one per tile
    i_tile = jnp.arange(n_tiles, dtype=jnp.int32)

    tile = jnp.concatenate([i_tile, jnp.where(w_valid, w_tile,
                                              n_tiles - 1)])
    chunk = jnp.concatenate([jnp.zeros(n_tiles, jnp.int32), c])
    flag = jnp.concatenate([
        jnp.full(n_tiles, PAIR_FLAG_INIT, jnp.int32),
        jnp.where(w_valid, PAIR_FLAG_WORK, PAIR_FLAG_PAD)])
    # sort: (tile, init-before-work), padding last (maps to last tile)
    key = jnp.where(flag == PAIR_FLAG_PAD, 2 * n_tiles,
                    tile * 2 + (flag == PAIR_FLAG_WORK))
    order = jnp.argsort(key)
    tile, chunk, flag = tile[order], chunk[order], flag[order]
    dropped = jnp.maximum(total - n_pairs, 0).astype(jnp.int32)
    return (tile // n_tu).astype(jnp.int32), \
        (tile % n_tu).astype(jnp.int32), chunk, flag, dropped


def binned_pair_stats(uv, z, faces, h: int, w: int,
                      pair_factor: int = 8) -> dict:
    """Diagnose the binned path's static work-list capacity for a mesh.

    Returns ``{"needed": N, "capacity": C, "fits": bool}`` — when
    ``fits`` is False, :func:`rasterize_pallas_binned` at this
    ``pair_factor`` would DROP (tile, chunk) pairs and faces would go
    missing from some tiles; raise ``pair_factor`` (or decimate the
    mesh, :mod:`pix2pose_tpu.data.meshes`). Cheap host-side check for
    offline validation of a mesh/pose regime."""
    import numpy as np

    uv = jnp.asarray(uv, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    n_tv, n_tu = h // TILE_V, w // TILE_U
    _, _, bounds, n_chunks = _sorted_tris(uv, z, faces, h, w)
    b = np.asarray(bounds)
    ctv0 = np.clip(np.floor(b[:, 0] / TILE_V), 0, n_tv - 1)
    ctv1 = np.clip(np.floor(b[:, 1] / TILE_V), 0, n_tv - 1)
    ctu0 = np.clip(np.floor(b[:, 2] / TILE_U), 0, n_tu - 1)
    ctu1 = np.clip(np.floor(b[:, 3] / TILE_U), 0, n_tu - 1)
    off = (b[:, 1] < 0) | (b[:, 0] > n_tv * TILE_V - 1) \
        | (b[:, 3] < 0) | (b[:, 2] > n_tu * TILE_U - 1) \
        | (b[:, 0] > b[:, 1])
    span = np.where(off, 0, (ctv1 - ctv0 + 1) * (ctu1 - ctu0 + 1))
    needed = int(span.sum())
    capacity = min(n_chunks * n_tv * n_tu,
                   max(pair_factor * n_chunks, 1024))
    return {"needed": needed, "capacity": capacity,
            "fits": needed <= capacity}


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "pair_factor", "interpret"))
def rasterize_pallas_binned(uv, z, faces, attrs, h: int, w: int,
                            pair_factor: int = 8,
                            interpret: bool = False) -> RenderOut:
    """Work-list rasterization: grid steps = actual (tile, chunk) overlap
    pairs instead of the full tiles x chunks product.

    Same contract as :func:`rasterize_pallas`. The flat pair list is
    driven through ``PrefetchScalarGridSpec`` — the output BlockSpec index
    map reads the prefetched tile id, so consecutive entries of one tile
    revisit the same VMEM block without HBM round-trips. At 100k faces /
    VGA the exhaustive grid walks ~120k mostly-no-op steps; this walks
    ~(tiles + 2-6x chunks).

    ``pair_factor``: static WORK capacity = ``pair_factor * n_chunks``.
    After the spatial sort a chunk's bbox overlaps a handful of tiles, so
    8 is generous for real meshes; chunks of near-degenerate/huge
    triangles (bbox spanning many tiles) can exceed it, in which case
    excess pairs are DROPPED (faces missing from some tiles). The dropped
    count is reported as ``RenderOut.overflow`` (device scalar; 0 =
    exact) — truncation-sensitive callers accumulate it and check at
    fetch time; raise ``pair_factor`` when it fires.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if h % TILE_V or w % TILE_U:
        raise ValueError(f"(h={h}, w={w}) must tile by "
                         f"({TILE_V}, {TILE_U})")
    uv = jnp.asarray(uv, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    attrs = jnp.asarray(attrs, jnp.float32)

    n_tv, n_tu = h // TILE_V, w // TILE_U
    packed, faces, bounds, n_chunks = _sorted_tris(uv, z, faces, h, w)
    # capacity: pair_factor x chunks, floored at 1024 so small meshes
    # (whose few chunks each span many tiles) stay exact, and capped at
    # the true upper bound tiles x chunks
    n_pairs = min(n_chunks * n_tv * n_tu,
                  max(pair_factor * n_chunks, 1024))
    pair_tv, pair_tu, pair_chunk, pair_flag, dropped = _build_pairs(
        bounds, n_tv, n_tu, n_pairs)
    n_entries = n_tv * n_tu + n_pairs

    out_shapes = (
        jax.ShapeDtypeStruct((h, w), jnp.float32),   # z
        jax.ShapeDtypeStruct((h, w), jnp.int32),     # face idx
        jax.ShapeDtypeStruct((h, w), jnp.float32),   # bary a
        jax.ShapeDtypeStruct((h, w), jnp.float32),   # bary b
    )
    tile_spec = pl.BlockSpec(
        (TILE_V, TILE_U),
        lambda i, tv, tu, pc, pf: (tv[i], tu[i]))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_entries,),
        in_specs=[pl.BlockSpec((9, FACE_CHUNK),
                               lambda i, tv, tu, pc, pf: (0, pc[i]),
                               memory_space=pltpu.SMEM)],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
    )
    zb, fidx, ba, bb = pl.pallas_call(
        _binned_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(pair_tv, pair_tu, pair_chunk, pair_flag, packed)
    return _attr_epilogue(zb, fidx, ba, bb, faces, z, attrs,
                          overflow=dropped)


def render_mesh_pallas(verts, faces, attrs, R, t, K, h: int, w: int,
                       interpret: bool = False) -> RenderOut:
    uv, z = project_vertices(verts, R, t, K)
    return rasterize_pallas(uv, z, faces, attrs, h, w,
                            interpret=interpret)
