"""BOP pose-error metrics and Average Recall, in-repo.

The reference computes NO metrics itself — result CSVs are scored offline by
the external ``bop_toolkit`` (SURVEY.md §4: "external metric harness",
reference ``README.md:48,112``). For a self-contained framework we
implement the BOP'19 protocol natively:

- VSD (visible surface discrepancy): depth renders of both poses via the
  JAX rasterizer, visibility w.r.t. the sensor depth with delta=15mm,
  misfit tolerance tau; recall over tau in {5..50%} of diameter x theta in
  {0.05..0.5}.
- MSSD (maximum symmetry-aware surface distance): min over the symmetry
  pool of the max vertex distance; recall over theta in {5..50%} diameter.
- MSPD (maximum symmetry-aware projection distance): same in pixels;
  recall over theta in {5r..50r}, r = im_w / 640.
- AR = mean of the three per-metric recalls (BOP'19 definition).
- Plus classic ADD / ADD-S for LineMOD-style reporting.

Distance kernels are jitted/vmapped over the symmetry pool; the matching
harness runs on host and follows bop_toolkit exactly
(``score.py:match_poses`` + ``calc_localization_scores``): estimates are
sorted by score and capped at the instance count (top-n), errors are
computed for every (estimate, GT) pair, and matching is re-done GREEDILY
PER CORRECTNESS THRESHOLD — for each threshold (and each VSD tau),
estimates in score order each take the not-yet-matched GT with the
smallest error strictly below the threshold. Recall(threshold) is
per-object micro (correct/targets across the dataset); the reported
per-metric AR is the mean over thresholds of the mean over objects
(bop_toolkit's ``mean_obj_recall``), and AR is the mean of the three
per-metric ARs (BOP'19).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops import rasterizer


# ---------------------------------------------------------------------------
# distance kernels
# ---------------------------------------------------------------------------


@jax.jit
def add_metric(pts, R_est, t_est, R_gt, t_gt):
    """ADD: mean vertex distance (mm)."""
    a = pts @ R_est.T + t_est
    b = pts @ R_gt.T + t_gt
    return jnp.mean(jnp.linalg.norm(a - b, axis=1))


@jax.jit
def adi_metric(pts, R_est, t_est, R_gt, t_gt):
    """ADD-S / ADI: mean nearest-neighbor distance (mm), symmetric
    objects."""
    a = pts @ R_est.T + t_est
    b = pts @ R_gt.T + t_gt
    d2 = (jnp.sum(a ** 2, 1)[:, None] - 2 * a @ b.T
          + jnp.sum(b ** 2, 1)[None, :])
    return jnp.mean(jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0)))


def _sym_pool_rt(sym_pool):
    """Accept either (S,3,3) rotations or an ((S,3,3), (S,3)) pair of full
    rigid symmetry transforms (bop_toolkit uses the full (R_s, t_s) —
    some T-LESS/HB/YCB-V symmetries carry non-zero translation)."""
    if isinstance(sym_pool, tuple):
        return sym_pool
    sym_pool = jnp.asarray(sym_pool)
    return sym_pool, jnp.zeros((sym_pool.shape[0], 3), sym_pool.dtype)


@jax.jit
def mssd_metric(pts, sym_pool, R_est, t_est, R_gt, t_gt):
    """min over symmetries of max vertex distance (mm)."""
    sym_R, sym_t = _sym_pool_rt(sym_pool)
    a = pts @ R_est.T + t_est

    def per_sym(S, St):
        b = (pts @ S.T + St) @ R_gt.T + t_gt
        return jnp.max(jnp.linalg.norm(a - b, axis=1))

    return jnp.min(jax.vmap(per_sym)(sym_R, sym_t))


@jax.jit
def mspd_metric(pts, sym_pool, K, R_est, t_est, R_gt, t_gt):
    """min over symmetries of max projected distance (px)."""
    sym_R, sym_t = _sym_pool_rt(sym_pool)

    def proj(p):
        z = jnp.maximum(p[:, 2], 1e-9)
        u = K[0, 0] * p[:, 0] / z + K[0, 2]
        v = K[1, 1] * p[:, 1] / z + K[1, 2]
        return jnp.stack([u, v], 1)

    a = proj(pts @ R_est.T + t_est)

    def per_sym(S, St):
        b = proj((pts @ S.T + St) @ R_gt.T + t_gt)
        return jnp.max(jnp.linalg.norm(a - b, axis=1))

    return jnp.min(jax.vmap(per_sym)(sym_R, sym_t))


def make_vsd(verts_mm, faces, im_h: int, im_w: int, delta_mm: float = 15.0):
    """Build a jitted VSD(e | taus) evaluator for one mesh.

    Returns fn(R_est, t_est_mm, R_gt, t_gt_mm, K, scene_depth_mm, taus_mm)
    -> ((n_tau,) errors in [0, 1], () int32 rasterizer work-pair overflow
    — nonzero means the binned Pallas driver truncated and the errors are
    suspect; see ``RenderOut.overflow``)."""
    verts = jnp.asarray(verts_mm, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    zattr = jnp.zeros((verts.shape[0], 1))

    @jax.jit
    def vsd(R_est, t_est, R_gt, t_gt, K, depth_scene, taus):
        ro_est = rasterizer.render_mesh(verts, faces, zattr, R_est, t_est,
                                        K, im_h, im_w)
        ro_gt = rasterizer.render_mesh(verts, faces, zattr, R_gt, t_gt, K,
                                       im_h, im_w)
        d_est, m_est = ro_est.depth, ro_est.mask
        d_gt, m_gt = ro_gt.depth, ro_gt.mask
        has_scene = depth_scene > 0
        # visibility: rendered surface within delta in front of the scene
        # depth (or no scene measurement -> visible)
        vis_est = m_est & (~has_scene | (d_est < depth_scene + delta_mm))
        vis_gt = m_gt & (~has_scene | (d_gt < depth_scene + delta_mm))
        # BOP'19 extension (bop_toolkit visibility.py): estimate pixels
        # where the GT surface is visible count as visible even when
        # occluded by scene depth, so occlusion mismatch is not penalized
        # twice
        vis_est = vis_est | (vis_gt & m_est)
        union = vis_est | vis_gt
        inter = vis_est & vis_gt
        dist = jnp.abs(d_est - d_gt)
        n_union = jnp.maximum(jnp.sum(union), 1)

        def err_for(tau):
            ok = inter & (dist <= tau)
            return 1.0 - jnp.sum(ok) / n_union

        return jax.vmap(err_for)(taus), (jnp.int32(ro_est.overflow)
                                         + jnp.int32(ro_gt.overflow))

    return vsd


# ---------------------------------------------------------------------------
# AR harness
# ---------------------------------------------------------------------------

_THETAS = np.arange(0.05, 0.51, 0.05)  # VSD theta / rel-diameter fractions
_TAU_FRACS = np.arange(0.05, 0.51, 0.05)  # VSD tau as diameter fraction
_MSPD_R = np.arange(5, 51, 5)  # px at 640-width


@functools.lru_cache(maxsize=None)
def _subsample_idx(n, target):
    if n <= target:
        return np.arange(n)
    return np.linspace(0, n - 1, target).astype(np.int64)


def _greedy_match_count(err: np.ndarray, th: float) -> int:
    """bop_toolkit ``score.match_poses`` for one threshold: walk
    estimates in score order (rows of ``err`` are pre-sorted by score),
    each taking the not-yet-matched GT with the smallest error strictly
    below ``th``. Returns the number of matches (= correct poses)."""
    taken = np.zeros(err.shape[1], bool)
    n = 0
    for ei in range(err.shape[0]):
        row = np.where(taken, np.inf, err[ei])
        gi = int(np.argmin(row))
        if row[gi] < th:
            taken[gi] = True
            n += 1
    return n


def evaluate_bop(results, dataset, target_list=None, metrics=("vsd",
                                                              "mssd",
                                                              "mspd"),
                 n_pts: int = 2000, verbose: bool = False) -> dict:
    """Score BOP-format results against dataset GT.

    Args:
      results: list of result dicts (scene_id, im_id, obj_id, score, R, t).
      dataset: :class:`BopDataset` (test split).
      target_list: optional target list; defaults to all GT instances of
        the images present in ``results``.

    Returns:
      {"AR": float, "AR_vsd": ..., "AR_mssd": ..., "AR_mspd": ...,
       per-object recalls}.
    """
    from collections import defaultdict

    from pix2pose_tpu.data.ply import load_ply

    by_image = defaultdict(list)
    for r in results:
        by_image[(r["scene_id"], r["im_id"])].append(r)

    meshes, sym_pools, diams, vsd_fns = {}, {}, {}, {}
    im_w, im_h = dataset.im_size
    r_px = im_w / 640.0

    def get_mesh(obj_id):
        if obj_id not in meshes:
            m = load_ply(dataset.model_ply_path(obj_id))
            idx = _subsample_idx(m["pts"].shape[0], n_pts)
            meshes[obj_id] = (jnp.asarray(m["pts"][idx]),
                              m["pts"], m["faces"])
            # full (R_s, t_s) symmetry transforms incl. densified
            # continuous symmetries with their offsets (bop_toolkit
            # get_symmetry_transformations equivalence)
            sym_R, sym_t = dataset.symmetry_transforms(obj_id)
            sym_pools[obj_id] = (jnp.asarray(sym_R), jnp.asarray(sym_t))
            diams[obj_id] = float(
                dataset.model_info(obj_id).get("diameter", 0.0)) or float(
                np.linalg.norm(m["pts"].max(0) - m["pts"].min(0)))
            vsd_fns[obj_id] = make_vsd(m["pts"], m["faces"], im_h, im_w)
        return meshes[obj_id]

    # bop_toolkit-style accumulators: per (object, metric) the correct
    # count PER THRESHOLD COMBO and the target count (same for every
    # combo of a metric). Combos: mssd/mspd -> 10 thetas; vsd -> 100
    # (tau, theta) pairs.
    n_combo = {"mssd": len(_THETAS), "mspd": len(_MSPD_R),
               "vsd": len(_TAU_FRACS) * len(_THETAS)}
    correct = defaultdict(
        lambda: {m: np.zeros(n_combo[m], np.int64) for m in metrics})
    totals = defaultdict(int)

    if target_list is None:
        target_list = []
        for (s, i) in sorted(by_image.keys()):
            gts = dataset.scene_gt(s).get(i, [])
            objs = sorted({g["obj_id"] for g in gts})
            target_list.append(
                (s, i, objs,
                 [sum(1 for g in gts if g["obj_id"] == o) for o in objs]))

    cam_cache = {}
    for scene_id, im_id, obj_ids, inst_counts in target_list:
        if scene_id not in cam_cache:
            cam_cache[scene_id] = (dataset.scene_camera(scene_id),
                                   dataset.scene_gt(scene_id))
        cams, gts_all = cam_cache[scene_id]
        cam_k = cams[im_id]["cam_K"]
        gts = gts_all.get(im_id, [])
        ests_img = sorted(by_image.get((scene_id, im_id), []),
                          key=lambda r: -r["score"])
        depth_scene = None
        if "vsd" in metrics:
            try:
                depth_scene = jnp.asarray(dataset.load_depth(
                    scene_id, im_id, cams[im_id]["depth_scale"]) * 1000.0)
            except FileNotFoundError:
                depth_scene = jnp.zeros((im_h, im_w), jnp.float32)

        for obj_id, n_inst in zip(obj_ids, inst_counts):
            gt_list = [g for g in gts if g["obj_id"] == obj_id]
            est_list = [r for r in ests_img
                        if r["obj_id"] == obj_id][:n_inst]
            pts_sub, pts_full, faces = get_mesh(obj_id)
            pool = sym_pools[obj_id]
            diam = diams[obj_id]
            n_gt, n_est = len(gt_list), len(est_list)
            totals[obj_id] += n_gt
            if n_gt == 0 or n_est == 0:
                continue

            # error tensors over ALL (estimate, GT) pairs — matching is
            # threshold-dependent, so no pair can be skipped up front
            E = {}
            if "mssd" in metrics:
                E["mssd"] = np.full((n_est, n_gt), np.inf)
            if "mspd" in metrics:
                E["mspd"] = np.full((n_est, n_gt), np.inf)
            if "vsd" in metrics:
                E["vsd"] = np.full((n_est, n_gt, len(_TAU_FRACS)), np.inf)
                taus = jnp.asarray(_TAU_FRACS * diam, jnp.float32)
            for ei, est in enumerate(est_list):
                for gi, gt in enumerate(gt_list):
                    if "mssd" in metrics:
                        E["mssd"][ei, gi] = float(mssd_metric(
                            pts_sub, pool, est["R"], est["t"], gt["R"],
                            gt["t"]))
                    if "mspd" in metrics:
                        E["mspd"][ei, gi] = float(mspd_metric(
                            pts_sub, pool, cam_k, est["R"], est["t"],
                            gt["R"], gt["t"]))
                    if "vsd" in metrics:
                        vsd_err, vsd_ovf = vsd_fns[obj_id](
                            est["R"], est["t"], gt["R"], gt["t"], cam_k,
                            depth_scene, taus)
                        E["vsd"][ei, gi] = np.asarray(vsd_err)
                        if int(vsd_ovf):
                            import warnings
                            warnings.warn(
                                "VSD render truncated "
                                f"({int(vsd_ovf)} dropped rasterizer "
                                "work pairs) — raise pair_factor or "
                                "decimate the mesh", RuntimeWarning)

            # per-threshold greedy matching (bop_toolkit
            # ``score.match_poses``): estimates in score order, each
            # takes the unmatched GT with the smallest error strictly
            # below the threshold
            if "mssd" in metrics:
                for k, th in enumerate(_THETAS * diam):
                    correct[obj_id]["mssd"][k] += _greedy_match_count(
                        E["mssd"], th)
            if "mspd" in metrics:
                for k, th in enumerate(_MSPD_R * r_px):
                    correct[obj_id]["mspd"][k] += _greedy_match_count(
                        E["mspd"], th)
            if "vsd" in metrics:
                k = 0
                for ti in range(len(_TAU_FRACS)):
                    ev = E["vsd"][:, :, ti]
                    for th in _THETAS:
                        correct[obj_id]["vsd"][k] += \
                            _greedy_match_count(ev, th)
                        k += 1

    # per-object recall per threshold combo -> mean over combos; the
    # per-metric AR is the mean over objects (bop_toolkit
    # ``mean_obj_recall``) averaged over combos
    obj_ids_seen = [o for o in totals if totals[o] > 0]
    out = {}
    per_object = {}
    for o in obj_ids_seen:
        per_object[o] = {
            m: float(np.mean(correct[o][m] / totals[o])) for m in metrics}
    for m in metrics:
        if obj_ids_seen:
            combo_recall = np.mean(
                [correct[o][m] / totals[o] for o in obj_ids_seen], axis=0)
            out[f"AR_{m}"] = float(np.mean(combo_recall))
        else:
            out[f"AR_{m}"] = 0.0
    out["AR"] = float(np.mean([out[f"AR_{m}"] for m in metrics]))
    out["per_object"] = per_object
    return out


def add_recall(results, dataset, th_frac: float = 0.1, n_pts: int = 2000,
               use_adi_for_sym: bool = True) -> float:
    """Classic LineMOD ADD(-S) recall at ``th_frac`` x diameter."""
    from pix2pose_tpu.data.ply import load_ply

    ok, total = 0, 0
    mesh_cache = {}
    gt_cache = {}
    for r in results:
        obj_id = r["obj_id"]
        if obj_id not in mesh_cache:
            m = load_ply(dataset.model_ply_path(obj_id))
            idx = _subsample_idx(m["pts"].shape[0], n_pts)
            info = dataset.model_info(obj_id)
            sym = ("symmetries_discrete" in info
                   or "symmetries_continuous" in info)
            diam = float(info.get("diameter", 0.0)) or float(
                np.linalg.norm(m["pts"].max(0) - m["pts"].min(0)))
            mesh_cache[obj_id] = (jnp.asarray(m["pts"][idx]), sym, diam)
        pts, sym, diam = mesh_cache[obj_id]
        if r["scene_id"] not in gt_cache:
            gt_cache[r["scene_id"]] = dataset.scene_gt(r["scene_id"])
        gts = [g for g in gt_cache[r["scene_id"]].get(r["im_id"], [])
               if g["obj_id"] == obj_id]
        if not gts:
            continue
        fn = adi_metric if (sym and use_adi_for_sym) else add_metric
        err = min(float(fn(pts, r["R"], r["t"], g["R"], g["t"]))
                  for g in gts)
        ok += err < th_frac * diam
        total += 1
    return ok / max(total, 1)
