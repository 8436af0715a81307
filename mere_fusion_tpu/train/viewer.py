"""Interactive ER-NeRF *training* viewer — watch the avatar learn, live.

The reference GUI trains inside its render loop: every displayed frame runs
``train_steps`` optimizer steps (adaptive 4-16, retargeted so training takes
~500 ms per displayed frame) and then re-renders the current orbit-camera
view with the in-flight weights (ernerf/nerf_triplane/gui.py:140-162
``train_step`` + the retarget rule at :158-162, driven from dearpygui).

dearpygui has no headless/TPU story, so — like the inference orbit viewer
(engines/orbit.py, server/app.py /preview) — the display here is HTTP:

  GET  /preview         MJPEG stream of the freshest rendered train view
  GET  /stats           {"step", "loss", "train_steps", "render_ms", ...}
  POST /camera          {"dx","dy"} orbit · {"scale"} dolly · {"pan":[dx,dy]}
                        · {"reset": true} — same contract as the serving
                        /camera route (server/app.py)

``TrainingViewer.tick(state, it, metrics)`` is called once per training
iteration from the train loop; every ``train_steps`` ticks it renders one
frame at the viewer resolution from the CURRENT (non-EMA) params — the
reference likewise shows the raw training weights — and retargets
``train_steps`` from the measured train/render split.
"""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from mere_fusion_tpu.engines.orbit import OrbitCamera


class TrainingViewer:
    """HTTP MJPEG viewer wrapped around a render closure.

    render_fn(state, pose [4,4] f32, intrinsics [4] f32) -> float image
    [H,W,3] in [0,1] rendered with the live training state passed to
    ``tick`` (its params/density, NOT the EMA — the reference train GUI
    shows the raw in-flight weights too).
    """

    def __init__(self, render_fn, width: int = 256, height: int = 256,
                 port: int = 0, radius: float = 3.35, fovy: float = 21.24,
                 target_train_ms: float = 500.0):
        # radius/fovy defaults mirror the reference GUI opts for the NGP
        # face scene (gui.py / main.py defaults)
        self.render_fn = render_fn
        self.cam = OrbitCamera(width, height, r=radius, fovy=fovy)
        self.train_steps = 16          # adaptive, 4..16 (gui.py:118)
        self.target_train_ms = target_train_ms
        self._tick_count = 0
        self._t_window = time.perf_counter()
        self._lock = threading.Lock()
        # guards OrbitCamera state: /camera POSTs arrive on
        # ThreadingHTTPServer handler threads concurrently with the
        # training thread's tick renders — mutations and pose snapshots
        # must not interleave mid-update (torn camera state)
        self._cam_lock = threading.Lock()
        self._jpeg: bytes | None = None
        self._jpeg_seq = 0
        self._frame_event = threading.Condition(self._lock)
        self.stats: dict = {"step": 0, "train_steps": self.train_steps}
        self._state = None
        self._httpd = _make_server(self, port)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="train-viewer",
            daemon=True)
        self._thread.start()

    # -- train-loop side -------------------------------------------------
    def bind_state(self, state) -> None:
        with self._lock:
            self._state = state

    def tick(self, state, it: int, metrics: dict) -> None:
        """Call once per training iteration; renders every train_steps."""
        self.bind_state(state)
        self._tick_count += 1
        if self._tick_count < self.train_steps:
            return
        t_train = (time.perf_counter() - self._t_window) * 1e3
        t0 = time.perf_counter()
        self._render_once(state)
        render_ms = (time.perf_counter() - t0) * 1e3
        # retarget: scale measured train time to a full 16-step window and
        # aim ``target_train_ms`` of training per displayed frame, only
        # moving when ±20% off (gui.py:158-162)
        full_t = t_train / self._tick_count * 16.0
        want = min(16, max(4, int(16 * self.target_train_ms
                                  / max(full_t, 1e-3))))
        if want > self.train_steps * 1.2 or want < self.train_steps * 0.8:
            self.train_steps = want
        with self._lock:
            self.stats = {
                "step": int(it),
                "loss": float(metrics.get("loss", float("nan"))),
                "train_steps": self.train_steps,
                "train_ms_per_it": t_train / max(self._tick_count, 1),
                "render_ms": render_ms,
            }
        self._tick_count = 0
        self._t_window = time.perf_counter()

    def _render_once(self, state) -> None:
        with self._cam_lock:     # coherent snapshot; render outside the lock
            pose = self.cam.pose.astype(np.float32)
            intr = self.cam.intrinsics.astype(np.float32)
        img = np.asarray(self.render_fn(state, pose, intr))
        u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        import cv2

        ok, jpg = cv2.imencode(".jpg", u8[..., ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, 85])
        if not ok:
            return
        with self._frame_event:
            self._jpeg = jpg.tobytes()
            self._jpeg_seq += 1
            self._frame_event.notify_all()

    def close(self) -> None:
        self._httpd.shutdown()
        self._thread.join(timeout=5)
        self._httpd.server_close()

    # -- HTTP side -------------------------------------------------------
    def wait_jpeg(self, last_seq: int, timeout: float = 5.0):
        with self._frame_event:
            if self._jpeg_seq == last_seq:
                self._frame_event.wait(timeout)
            return self._jpeg, self._jpeg_seq

    def apply_camera(self, msg: dict) -> None:
        with self._cam_lock:     # handler threads race each other + tick
            if msg.get("reset"):
                self.cam.reset()
            if "dx" in msg or "dy" in msg:
                self.cam.orbit(float(msg.get("dx", 0)),
                               float(msg.get("dy", 0)))
            if "scale" in msg:
                self.cam.scale(float(msg["scale"]))
            if "pan" in msg:
                dx, dy = msg["pan"]
                self.cam.pan(float(dx), float(dy))
        # next render picks the camera up; force one now if idle
        state = self._state
        if state is not None:
            self._render_once(state)


def _make_server(viewer: TrainingViewer, port: int) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/stats"):
                with viewer._lock:
                    body = json.dumps(viewer.stats).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/preview"):
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=mjpeg")
                self.end_headers()
                seq = -1
                try:
                    while True:
                        jpg, seq2 = viewer.wait_jpeg(seq)
                        if jpg is None or seq2 == seq:
                            continue
                        seq = seq2
                        self.wfile.write(
                            b"--mjpeg\r\nContent-Type: image/jpeg\r\n"
                            + f"Content-Length: {len(jpg)}\r\n\r\n".encode()
                            + jpg + b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass
            else:
                self.send_error(404)

        def do_POST(self):
            if not self.path.startswith("/camera"):
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                msg = json.loads(self.rfile.read(n) or b"{}")
                viewer.apply_camera(msg)
            except (ValueError, KeyError, TypeError) as e:
                self.send_response(400)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            body = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
