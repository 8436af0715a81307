"""Interactive training viewer: HTTP contract + adaptive train_steps.

The reference trains inside its GUI render loop with an adaptive
steps-per-frame target (ernerf/nerf_triplane/gui.py:140-162); ours serves
the same loop headlessly over HTTP (train/viewer.py). These tests drive the
real HTTP server with a synthetic render closure — no model needed.
"""
from __future__ import annotations

import json
import time
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mere_fusion_tpu.train.viewer import TrainingViewer  # noqa: E402


class FakeState:
    pass


def make_viewer(**kw):
    calls = []

    def render_fn(state, pose, intrinsics):
        calls.append((np.asarray(pose).copy(), np.asarray(intrinsics).copy()))
        img = np.zeros((32, 32, 3), np.float32)
        img[8:24, 8:24] = [0.2, 0.5, 0.9]
        return img

    v = TrainingViewer(render_fn, width=32, height=32, port=0, **kw)
    return v, calls


def _get(port, path, timeout=5.0):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout)


def test_tick_renders_every_train_steps_and_serves_stats():
    v, calls = make_viewer()
    try:
        st = FakeState()
        # 16 default steps per frame -> exactly one render after 16 ticks
        for it in range(16):
            v.tick(st, it, {"loss": 0.5})
        assert len(calls) == 1
        with _get(v.port, "/stats") as r:
            stats = json.loads(r.read())
        assert stats["step"] == 15
        assert stats["loss"] == 0.5
        assert 4 <= stats["train_steps"] <= 16
        assert "render_ms" in stats and "train_ms_per_it" in stats
    finally:
        v.close()


def test_adaptive_train_steps_drops_when_training_is_slow():
    v, _ = make_viewer(target_train_ms=1.0)  # impossible target
    try:
        st = FakeState()
        for it in range(32):
            time.sleep(0.002)  # "training" is slow vs the 1 ms target
            v.tick(st, it, {"loss": 0.1})
        assert v.train_steps == 4  # clamped at the reference floor
    finally:
        v.close()


def test_preview_streams_mjpeg_and_camera_rerenders():
    v, calls = make_viewer()
    try:
        st = FakeState()
        for it in range(16):
            v.tick(st, it, {"loss": 0.5})
        n0 = len(calls)

        with _get(v.port, "/preview") as r:
            assert r.headers["Content-Type"].startswith(
                "multipart/x-mixed-replace")
            chunk = r.read(64)
            assert b"--mjpeg" in chunk and b"image/jpeg" in chunk

        # orbit via POST /camera forces a fresh render with the moved pose
        pose_before = v.cam.pose.copy()
        req = urllib.request.Request(
            f"http://127.0.0.1:{v.port}/camera",
            data=json.dumps({"dx": 400.0, "dy": 0.0}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert json.loads(r.read())["ok"] is True
        assert len(calls) == n0 + 1
        assert not np.allclose(calls[-1][0], pose_before)

        # malformed body -> 400, viewer still alive
        req = urllib.request.Request(
            f"http://127.0.0.1:{v.port}/camera", data=b"{bad",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=5)
        assert ei.value.code == 400
        with _get(v.port, "/stats") as r:
            assert json.loads(r.read())["step"] == 15
    finally:
        v.close()


def test_viewer_renders_real_nerf_training(tmp_path):
    """The full CLI wiring: _make_viewer_render over live training state —
    train a few steps on a synthetic scene, orbit the camera, and pull a
    frame of the in-flight weights over HTTP."""
    import jax
    import jax.numpy as jnp

    from mere_fusion_tpu.data.provider import (
        NeRFTrainDataset,
        synthesize_nerf_train_data,
    )
    from mere_fusion_tpu.models.ernerf.network import (
        NeRFNetConfig,
        NeRFNetwork,
    )
    from mere_fusion_tpu.train.ernerf_cli import _make_viewer_render
    from mere_fusion_tpu.train.ernerf_train import (
        NeRFTrainConfig,
        init_nerf_train,
        make_nerf_train_step,
    )

    root = synthesize_nerf_train_data(str(tmp_path / "scene"), n_frames=3,
                                      hw=32)
    dataset = NeRFTrainDataset.load(root, scale=1.0)
    net_cfg = NeRFNetConfig(num_levels=4, base_resolution=16,
                            desired_resolution=64, log2_hashmap_size=10,
                            num_train_frames=3)
    network = NeRFNetwork(net_cfg)
    variables = network.init(
        jax.random.key(0), jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0), jnp.zeros((1, 4)),
        jnp.zeros((1, 1)), method=NeRFNetwork.full_init)
    tcfg = NeRFTrainConfig(grid_size=16, n_candidates=16, n_steps=4,
                           iters=100)
    tx, state = init_nerf_train(network, variables, tcfg)
    step = make_nerf_train_step(network, tx, tcfg)

    v = TrainingViewer(_make_viewer_render(network, net_cfg, tcfg, dataset,
                                           size=32),
                       width=32, height=32, port=0)
    try:
        v.train_steps = 4
        rng = np.random.default_rng(0)
        for it in range(8):
            batch = dataset.sample_rays(it % 3, 128, rng)
            state, m = step(state, batch, jax.random.key(it))
            v.tick(state, it, m)
        with _get(v.port, "/stats") as r:
            stats = json.loads(r.read())
        assert stats["step"] == 7 and np.isfinite(stats["loss"])
        # the camera can orbit and the stream carries a decodable JPEG
        req = urllib.request.Request(
            f"http://127.0.0.1:{v.port}/camera",
            data=json.dumps({"dx": 100.0, "scale": 1.0}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())["ok"] is True
        jpg, seq = v.wait_jpeg(-1)
        assert jpg is not None and seq >= 1
        img = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
        assert img.shape == (32, 32, 3)
    finally:
        v.close()
