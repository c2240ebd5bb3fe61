"""Pallas TPU rasterizer core.

The XLA rasterizer (:mod:`pix2pose_tpu.ops.rasterizer`) carries the
z-buffer through a ``lax.scan`` over face chunks — correct, but the carry
round-trips HBM every chunk. This kernel keeps each pixel tile's z-buffer,
winning-face index and barycentrics resident in VMEM for the whole face
loop (the accumulation-across-grid pattern: the output BlockSpec ignores
the face-chunk grid dimension, so the block is revisited in place), and
only the final tile is written out. Attribute interpolation happens outside
the kernel as an XLA gather over the winning face indices.

This replaces the CUDA kernel's atomicMin z-buffer discipline
(``rendering/gpu_render.py:26-93``) with a race-free min-reduction
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
FAR = 1e9


def _kernel(tri_ref, bounds_ref, out_z_ref, out_f_ref, out_a_ref,
            out_b_ref):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    tv = pl.program_id(0)
    tu = pl.program_id(1)
    kc = pl.program_id(2)

    @pl.when(kc == 0)
    def _init():
        out_z_ref[:] = jnp.full((TILE_V, TILE_U), FAR, jnp.float32)
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

    zbuf = out_z_ref[:]
    fbuf = out_f_ref[:]
    abuf = out_a_ref[:]
    bbuf = out_b_ref[:]

    def face_body(f, carry):
        zbuf, fbuf, abuf, bbuf = carry
        # per-face scalars live in SMEM (tri_ref); dynamic scalar reads are
        # the supported pattern there
        v1, v2, v3 = tri_ref[0, f], tri_ref[1, f], tri_ref[2, f]
        u1, u2, u3 = tri_ref[3, f], tri_ref[4, f], tri_ref[5, f]
        z1, z2, z3 = tri_ref[6, f], tri_ref[7, f], tri_ref[8, f]
        den = (v2 - v3) * (u1 - u3) + (u3 - u2) * (v1 - v3)
        den_ok = jnp.abs(den) > 1e-12
        den = jnp.where(den_ok, den, 1.0)
        z_ok = (z1 > 0) & (z2 > 0) & (z3 > 0)
        du = pu - u3
        dv = pv - v3
        a = ((v2 - v3) * du + (u3 - u2) * dv) / den
        b = ((v3 - v1) * du + (u1 - u3) * dv) / den
        c = 1.0 - a - b
        cover = ((a >= 0) & (a <= 1) & (b >= 0) & (b <= 1) & (c >= 0)
                 & (c <= 1) & den_ok & z_ok)
        inv_zi = (a / jnp.maximum(z1, 1e-9) + b / jnp.maximum(z2, 1e-9)
                  + c / jnp.maximum(z3, 1e-9))
        zi = 1.0 / jnp.maximum(inv_zi, 1e-12)
        zi = jnp.where(cover, zi, FAR)
        better = zi < zbuf
        fid = kc * FACE_CHUNK + f
        return (jnp.where(better, zi, zbuf),
                jnp.where(better, fid, fbuf),
                jnp.where(better, a, abuf),
                jnp.where(better, b, bbuf))

    zbuf, fbuf, abuf, bbuf = jax.lax.fori_loop(
        0, FACE_CHUNK, face_body, (zbuf, fbuf, abuf, bbuf))
    out_z_ref[:] = zbuf
    out_f_ref[:] = fbuf
    out_a_ref[:] = abuf
    out_b_ref[:] = bbuf


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "interpret"))
def rasterize_pallas(uv, z, faces, attrs, h: int, w: int,
                     interpret: bool = False) -> RenderOut:
    """Pallas-core rasterization; same contract as
    :func:`pix2pose_tpu.ops.rasterizer.rasterize` (full-frame, v0=u0=0).

    ``h`` and ``w`` must be multiples of the tile size (16, 128).
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
    # each chunk's bbox is tight and the tile-level binning below prunes
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

    # pack (9, fp): rows v1 v2 v3 u1 u2 u3 z1 z2 z3
    packed = jnp.concatenate([tri_v.T, tri_u.T, tri_z.T], axis=0)

    n_chunks = fp // FACE_CHUNK
    grid = (h // TILE_V, w // TILE_U, n_chunks)

    # per-chunk screen bounds for tile-level binning (invalid faces must
    # not widen them)
    big = jnp.float32(1e9)
    vmin = jnp.where(valid_face[:, None], tri_v, big).min(1)
    vmax = jnp.where(valid_face[:, None], tri_v, -big).max(1)
    umin = jnp.where(valid_face[:, None], tri_u, big).min(1)
    umax = jnp.where(valid_face[:, None], tri_u, -big).max(1)
    cs = lambda a, red: red(a.reshape(n_chunks, FACE_CHUNK), axis=1)
    bounds = jnp.stack([cs(vmin, jnp.min), cs(vmax, jnp.max),
                        cs(umin, jnp.min), cs(umax, jnp.max)],
                       axis=1)  # (n_chunks, 4)

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

    mask = zb < FAR / 2
    depth = jnp.where(mask, zb, 0.0)
    # perspective-correct attribute interpolation from the winning face
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
    return RenderOut(depth=depth, attr=attr, mask=mask)


def render_mesh_pallas(verts, faces, attrs, R, t, K, h: int, w: int,
                       interpret: bool = False) -> RenderOut:
    uv, z = project_vertices(verts, R, t, K)
    return rasterize_pallas(uv, z, faces, attrs, h, w,
                            interpret=interpret)
