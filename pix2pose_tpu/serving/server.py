"""Socket transport + cross-client batching for :class:`PoseService`.

The reference's only transport is a ROS node that processes one frame at
a time and *unsubscribes* while busy as backpressure
(``ros_kinetic/ros_pix2pose.py:274-284``). Here serving is a real
concurrent system shaped for the TPU's strengths:

- :class:`BatchingFrontend` — coalesces requests from concurrent clients
  into ONE padded device batch (``PoseService.process_many``: all frames
  x all objects in a single XLA launch). A lone request is dispatched
  immediately; under concurrency the dispatcher drains whatever queued
  while the previous batch was on device — adaptive batching with no
  fixed delay on an idle server.
- :class:`PoseServer` — threaded TCP server, length-prefixed frames
  (4-byte big-endian length + JSON header, then raw ndarray payloads).
  One thread per connection (threads only block on queues/sockets; the
  device work is serialized through the frontend).
- :class:`PoseClient` — blocking client helper.

Wire format, both directions: ``[u32 len][json][payload bytes...]``.
Request header: ``{"h", "w", "dtype", "want_images", "has_depth"}`` +
rgb bytes (+ float32 depth-in-meters bytes when ``has_depth``).
Response header: ``{"poses": [{obj_id, R, t, score, bbox}], "latency_s",
"server_batch"}`` (+ det/pose image bytes when ``want_images``).
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time
from typing import Sequence

import numpy as np


# ---------------------------------------------------------------- framing
def _send_msg(sock: socket.socket, header: dict,
              payloads: Sequence[bytes] = ()):
    blob = json.dumps(header).encode()
    sock.sendall(struct.pack("!I", len(blob)) + blob)
    for p in payloads:
        sock.sendall(struct.pack("!I", len(p)) + p)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _recv_msg(sock: socket.socket, n_payloads: int = 0):
    raw = _recv_exact(sock, 4)
    if raw is None:
        return None, None
    blob = _recv_exact(sock, struct.unpack("!I", raw)[0])
    if blob is None:  # mid-message disconnect
        return None, None
    header = json.loads(blob)
    payloads = []
    for _ in range(n_payloads):
        raw = _recv_exact(sock, 4)
        if raw is None:
            return None, None
        p = _recv_exact(sock, struct.unpack("!I", raw)[0])
        if p is None:
            return None, None
        payloads.append(p)
    return header, payloads


# ---------------------------------------------------------- batching core
class _Pending:
    __slots__ = ("rgb", "depth", "want_images", "event", "result",
                 "batch_size")

    def __init__(self, rgb, want_images, depth=None):
        self.rgb = rgb
        self.depth = depth
        self.want_images = want_images
        self.event = threading.Event()
        self.result = None
        self.batch_size = 0


class BatchingFrontend:
    """Coalesces concurrent ``submit`` calls into ``process_many``
    batches. Dispatch policy: take everything queued (up to
    ``max_batch``) the moment the device is free — latency-optimal when
    idle, throughput-optimal under load."""

    def __init__(self, service, max_batch: int = 8):
        self.service = service
        self.max_batch = max_batch
        self._q: list[_Pending] = []
        self._cv = threading.Condition()
        self._stop = False
        self.batch_sizes: list[int] = []  # dispatch-size telemetry
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, rgb: np.ndarray, want_images: bool = False,
               depth: np.ndarray | None = None):
        """Blocking: returns the completed ticket (``.result`` is the
        frame's FrameResult, ``.batch_size`` the dispatch batch size)."""
        p = _Pending(rgb, want_images, depth)
        with self._cv:
            self._q.append(p)
            self._cv.notify()
        p.event.wait()
        if isinstance(p.result, Exception):
            raise p.result
        return p

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=5)

    def _loop(self):
        while True:
            with self._cv:
                while not self._q and not self._stop:
                    self._cv.wait()
                if self._stop:
                    for p in self._q:
                        p.result = RuntimeError("frontend closed")
                        p.event.set()
                    return
                # one dispatch = one (shape, dtype) group: process_many
                # stacks frames into a single array, so mixed-resolution
                # clients must not land in the same batch. Head-of-queue
                # shape wins; other shapes stay queued for the next round
                k0 = (self._q[0].rgb.shape, self._q[0].rgb.dtype)
                batch = [p for p in self._q
                         if (p.rgb.shape, p.rgb.dtype) == k0
                         ][:self.max_batch]
                taken = set(map(id, batch))
                self._q = [p for p in self._q if id(p) not in taken]
            try:
                want = any(p.want_images for p in batch)
                depths = ([p.depth for p in batch]
                          if any(p.depth is not None for p in batch)
                          else None)
                results = self.service.process_many(
                    [p.rgb for p in batch], depths=depths,
                    want_images=want)
                self.batch_sizes.append(len(batch))
                for p, r in zip(batch, results):
                    p.result = r
                    p.batch_size = len(batch)
                    p.event.set()
            except Exception as e:  # surface to every waiter
                for p in batch:
                    p.result = e
                    p.event.set()


# ----------------------------------------------------------------- server
class PoseServer:
    """Threaded TCP front end over a :class:`BatchingFrontend`."""

    def __init__(self, service, host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 8):
        self.frontend = BatchingFrontend(service, max_batch=max_batch)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(32)
        self.address = self._sock.getsockname()
        self._stop = False
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def close(self):
        self._stop = True
        try:
            self._sock.close()
        except OSError:
            pass
        self.frontend.close()

    def _accept_loop(self):
        while not self._stop:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve_conn, args=(conn,),
                             daemon=True).start()

    def _serve_conn(self, conn: socket.socket):
        try:
            while True:
                # every read may hit a mid-message disconnect
                # (_recv_exact -> None): treat all of them as a clean
                # client hang-up, not a handler-thread crash
                header, payloads = _recv_msg(conn, 0)
                if header is None:
                    return
                n_payloads = 2 if header.get("has_depth") else 1
                disconnected = False
                for _ in range(n_payloads):
                    raw = _recv_exact(conn, 4)
                    if raw is None:
                        disconnected = True
                        break
                    p = _recv_exact(conn, struct.unpack("!I", raw)[0])
                    if p is None:
                        disconnected = True
                        break
                    payloads.append(p)
                if disconnected:
                    return
                rgb = np.frombuffer(
                    payloads[0], dtype=np.dtype(header["dtype"])
                ).reshape(header["h"], header["w"], 3)
                depth = None
                if header.get("has_depth"):
                    depth = np.frombuffer(
                        payloads[1], np.float32).reshape(
                        header["h"], header["w"])
                want = bool(header.get("want_images", False))
                try:
                    p = self.frontend.submit(rgb, want_images=want,
                                             depth=depth)
                except Exception as e:
                    _send_msg(conn, {"error": str(e)})
                    continue
                res = p.result
                out = {"poses": [
                    {"obj_id": int(po.obj_id),
                     "R": np.asarray(po.R).reshape(-1).tolist(),
                     "t": np.asarray(po.t).reshape(-1).tolist(),
                     "score": float(po.score),
                     "bbox": [int(x) for x in po.bbox]}
                    for po in res.poses],
                    "latency_s": res.latency_s,
                    "server_batch": p.batch_size}
                blobs = []
                if want:
                    out["image_shape"] = list(res.detection_image.shape)
                    blobs = [res.detection_image.tobytes(),
                             res.pose_image.tobytes()]
                _send_msg(conn, out, blobs)
        except (ConnectionResetError, BrokenPipeError, OSError):
            return
        finally:
            try:
                conn.close()
            except OSError:
                pass


class PoseClient:
    """Blocking client for :class:`PoseServer`."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port),
                                              timeout=timeout)

    def estimate(self, rgb: np.ndarray, want_images: bool = False,
                 depth: np.ndarray | None = None):
        """``depth``: optional (H,W) float32 meters — triggers the
        server's batched ICP refinement when the service has meshes."""
        rgb = np.ascontiguousarray(rgb)
        payloads = [rgb.tobytes()]
        header = {"h": int(rgb.shape[0]), "w": int(rgb.shape[1]),
                  "dtype": str(rgb.dtype),
                  "want_images": bool(want_images)}
        if depth is not None:
            header["has_depth"] = True
            payloads.append(np.ascontiguousarray(
                depth.astype(np.float32)).tobytes())
        _send_msg(self._sock, header, payloads)
        header, payloads = _recv_msg(self._sock,
                                     2 if want_images else 0)
        if header is None:
            raise ConnectionError("server closed connection")
        if "error" in header:
            raise RuntimeError(header["error"])
        if want_images:
            shape = tuple(header["image_shape"])
            header["detection_image"] = np.frombuffer(
                payloads[0], np.uint8).reshape(shape)
            header["pose_image"] = np.frombuffer(
                payloads[1], np.uint8).reshape(shape)
        return header

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass


def benchmark_concurrent(server: PoseServer, rgb: np.ndarray,
                         n_clients: int = 4, n_frames: int = 8) -> dict:
    """Drive the server with concurrent clients; returns latency and
    throughput stats plus the dispatch batch-size histogram."""
    host, port = server.address
    lat: list[float] = []
    lock = threading.Lock()

    def one_client():
        c = PoseClient(host, port)
        try:
            for _ in range(n_frames):
                t0 = time.time()
                c.estimate(rgb)
                with lock:
                    lat.append(time.time() - t0)
        finally:
            c.close()

    threads = [threading.Thread(target=one_client)
               for _ in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    sizes = server.frontend.batch_sizes
    return {"frames": n_clients * n_frames, "wall_s": wall,
            "fps": n_clients * n_frames / wall,
            "latency_p50_ms": float(np.median(lat) * 1e3),
            "latency_p95_ms": float(np.percentile(lat, 95) * 1e3),
            "batch_sizes": sizes[-(n_clients * n_frames):]}
