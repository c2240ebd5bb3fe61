"""Serving transport: coalescing frontend, socket round-trip, concurrent
clients, and process_many vs process equivalence (VERDICT #9; reference
transport = one-frame-at-a-time ROS node, ``ros_pix2pose.py:274-349``)."""

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.inference.detector import Detection
from pix2pose_tpu.serving import (BatchingFrontend, PoseClient,
                                  PoseServer, PoseService, ServingConfig)
from pix2pose_tpu.serving.server import benchmark_concurrent
from pix2pose_tpu.serving.viz import bbox_corners
from synthetic import CAM_K, OracleGenerator, pose_with_euler, xyz_scene
from test_rasterizer import cube_mesh


class PerFrameDetector:
    """Returns a GT box computed from the frame itself (xyz scenes have a
    gray background, so foreground = non-gray pixels)."""

    def detect(self, rgb):
        fg = np.any(np.abs(rgb.astype(int) - 128) > 8, axis=-1)
        vu = np.where(fg)
        if vu[0].size < 10:
            return []
        bbox = np.array([vu[0].min(), vu[1].min(), vu[0].max(),
                         vu[1].max()], np.int32)
        return [Detection(bbox=bbox, obj_id=1, score=0.9, mask=fg)]


@pytest.fixture(scope="module")
def oracle_service():
    model = OracleGenerator()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 3)))
    verts, _ = cube_mesh(40.0)
    cfg = ServingConfig(cam_K=np.asarray(CAM_K),
                        outlier_th=(0.1, 0.2, 0.3), inlier_th=0.1)
    obj_param = np.array([40, 40, 40, 0, 0, 0], np.float32)
    svc = PoseService(cfg, PerFrameDetector(), model, {1: params},
                      {1: obj_param}, {1: bbox_corners(verts)})
    frames = []
    for i in range(3):
        R, t = pose_with_euler(yaw=0.3 + 0.4 * i, tx=20.0 * i - 10.0)
        rgb, _, _ = xyz_scene(R, t)
        frames.append((rgb, R, t))
    return svc, frames


def test_process_many_matches_single_frame_path(oracle_service):
    svc, frames = oracle_service
    results = svc.process_many([f[0] for f in frames])
    assert len(results) == len(frames)
    for res, (_, R, t) in zip(results, frames):
        assert len(res.poses) == 1
        p = res.poses[0]
        assert np.linalg.norm(p.t - t) < 0.035 * t[2]
        # images skipped unless requested
        assert res.detection_image is None and res.pose_image is None
    # sequential path agrees
    single = svc.process(frames[0][0])
    np.testing.assert_allclose(single.poses[0].t,
                               results[0].poses[0].t,
                               rtol=0.05, atol=2.0)


def test_process_many_want_images(oracle_service):
    svc, frames = oracle_service
    rgb = frames[0][0]
    res = svc.process_many([rgb], want_images=True)[0]
    assert (res.pose_image != rgb).any()
    assert (res.detection_image != rgb).any()


class _FakeService:
    """Deterministic coalescing probe: records dispatch sizes, sleeps to
    let the queue fill behind the first dispatch."""

    def __init__(self, delay=0.15):
        self.delay = delay
        self.calls = []

    def process_many(self, rgbs, depths=None, want_images=False):
        self.calls.append(len(rgbs))
        time.sleep(self.delay)
        return [f"r{i}" for i in range(len(rgbs))]


def test_frontend_coalesces_queued_requests():
    fake = _FakeService()
    fe = BatchingFrontend(fake, max_batch=8)
    try:
        outs = []
        threads = [threading.Thread(
            target=lambda: outs.append(fe.submit(np.zeros(1))))
            for _ in range(5)]
        threads[0].start()
        time.sleep(0.05)  # first dispatch in flight
        for t in threads[1:]:
            t.start()
        for t in threads:
            t.join()
        assert sum(fake.calls) == 5
        # the 4 requests queued during dispatch #1 coalesce
        assert fake.calls[0] in (1, 5)
        assert max(fake.calls) >= 2 or fake.calls == [5]
        assert len(fake.calls) <= 3
    finally:
        fe.close()


def test_frontend_propagates_errors():
    class Boom:
        def process_many(self, rgbs, depths=None, want_images=False):
            raise ValueError("boom")

    fe = BatchingFrontend(Boom())
    try:
        with pytest.raises(ValueError, match="boom"):
            fe.submit(np.zeros(1))
    finally:
        fe.close()


def test_server_round_trip_and_concurrency(oracle_service):
    svc, frames = oracle_service
    server = PoseServer(svc, max_batch=4)
    try:
        host, port = server.address
        c = PoseClient(host, port)
        rgb, R, t = frames[1]
        out = c.estimate(rgb, want_images=True)
        assert len(out["poses"]) == 1
        np.testing.assert_allclose(out["poses"][0]["t"], t, rtol=0.05,
                                   atol=3.0)
        assert out["detection_image"].shape == rgb.shape
        c.close()

        stats = benchmark_concurrent(server, rgb, n_clients=4,
                                     n_frames=3)
        assert stats["frames"] == 12
        assert stats["fps"] > 0
        # coalescing happened: fewer dispatches than frames
        assert len(server.frontend.batch_sizes) < 1 + stats["frames"]
        assert max(server.frontend.batch_sizes) >= 2
    finally:
        server.close()


@pytest.fixture(scope="module")
def depth_service():
    """Oracle service with meshes + icp enabled and matching depth."""
    import dataclasses

    from pix2pose_tpu.ops import rasterizer

    model = OracleGenerator()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 3)))
    verts, faces = cube_mesh(40.0)
    cfg = ServingConfig(cam_K=np.asarray(CAM_K),
                        outlier_th=(0.1, 0.2, 0.3), inlier_th=0.1,
                        icp=True)
    svc = PoseService(cfg, PerFrameDetector(), model, {1: params},
                      {1: np.array([40, 40, 40, 0, 0, 0], np.float32)},
                      {1: bbox_corners(verts)},
                      meshes_m={1: (verts / 1000.0, faces)})
    frames = []
    for i in range(2):
        R, t = pose_with_euler(yaw=0.25 + 0.5 * i, tx=15.0 * i)
        rgb, _, _ = xyz_scene(R, t)
        depth_m, _ = rasterizer.render_depth(verts / 1000.0, faces, R,
                                             t / 1000.0, CAM_K, 480, 640)
        frames.append((rgb, np.asarray(depth_m), R, t))
    return svc, frames


def test_process_many_batched_icp_refinement(depth_service):
    svc, frames = depth_service
    rgbs = [f[0] for f in frames]
    depths = [f[1] for f in frames]
    plain = svc.process_many(rgbs)
    refined = svc.process_many(rgbs, depths=depths)
    assert len(refined) == len(frames)
    for res_p, res_r, (_, _, R, t) in zip(plain, refined, frames):
        assert len(res_r.poses) == 1
        err_p = np.linalg.norm(res_p.poses[0].t - t)
        err_r = np.linalg.norm(res_r.poses[0].t - t)
        # exact synthetic depth: ICP must not hurt, and must have engaged
        assert err_r <= err_p + 1.0
        assert err_r < 0.02 * t[2]
    # refinement actually changed at least one pose
    deltas = [np.linalg.norm(a.poses[0].t - b.poses[0].t)
              for a, b in zip(plain, refined)]
    assert max(deltas) > 1e-6


def test_process_many_mixed_depth_batch(depth_service):
    svc, frames = depth_service
    rgbs = [f[0] for f in frames]
    # only frame 1 has depth; frame 0 must still come back unrefined
    out = svc.process_many(rgbs, depths=[None, frames[1][1]])
    assert len(out) == 2 and all(len(r.poses) == 1 for r in out)


def test_server_depth_protocol(depth_service):
    svc, frames = depth_service
    server = PoseServer(svc, max_batch=4)
    try:
        c = PoseClient(*server.address)
        rgb, depth, R, t = frames[0]
        out = c.estimate(rgb, depth=depth)
        assert len(out["poses"]) == 1
        np.testing.assert_allclose(out["poses"][0]["t"], t, rtol=0.05,
                                   atol=5.0)
        c.close()
    finally:
        server.close()


def test_frontend_groups_mixed_resolutions():
    """Clients streaming different frame shapes must never share one
    dispatch (process_many stacks frames into a single array)."""

    class ShapeRecorder:
        def __init__(self):
            self.shapes = []

        def process_many(self, rgbs, depths=None, want_images=False):
            assert len({r.shape for r in rgbs}) == 1
            self.shapes.append([r.shape for r in rgbs])
            time.sleep(0.1)
            return list(range(len(rgbs)))

    fake = ShapeRecorder()
    fe = BatchingFrontend(fake, max_batch=8)
    try:
        outs = []
        shapes = [(8, 8, 3), (4, 4, 3), (8, 8, 3), (4, 4, 3), (8, 8, 3)]
        threads = [threading.Thread(
            target=lambda s=s: outs.append(fe.submit(np.zeros(s))))
            for s in shapes]
        threads[0].start()
        time.sleep(0.03)  # first dispatch in flight; rest queue up mixed
        for t in threads[1:]:
            t.start()
        for t in threads:
            t.join()
        assert len(outs) == 5
        assert sum(len(c) for c in fake.shapes) == 5
    finally:
        fe.close()
