import numpy as np
import pytest

from mere_fusion_tpu.engines.orbit import OrbitCamera


def test_initial_pose_matches_ngp_convention():
    cam = OrbitCamera(64, 64, r=2.0, fovy=60.0)
    pose = cam.pose
    # reference gui.py:24-33: pose = rot @ translate(-r on z), center 0
    rot = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    want = np.eye(4, dtype=np.float32)
    want[:3, :3] = rot
    want[:3, 3] = rot @ np.array([0, 0, -2.0], np.float32)
    np.testing.assert_allclose(pose, want, atol=1e-6)
    assert np.linalg.norm(pose[:3, 3]) == pytest.approx(2.0)


def test_intrinsics_formula():
    cam = OrbitCamera(128, 96, r=2.0, fovy=60.0)
    fl = 96 / (2 * np.tan(np.deg2rad(30)))
    np.testing.assert_allclose(cam.intrinsics, [fl, fl, 64, 48], rtol=1e-6)


def test_orbit_scale_pan_reset():
    cam = OrbitCamera(64, 64, r=2.0)
    p0 = cam.pose.copy()
    cam.orbit(120.0, -40.0)
    assert not np.allclose(cam.pose, p0)
    # orbit preserves the camera distance
    assert np.linalg.norm(cam.pose[:3, 3]) == pytest.approx(2.0, rel=1e-5)
    cam.scale(1.0)
    assert cam.radius == pytest.approx(2.0 / 1.1)
    cam.pan(100.0, -50.0)
    assert np.linalg.norm(cam.center) > 0
    cam.reset()
    np.testing.assert_allclose(cam.pose, p0, atol=1e-6)


def test_update_pose_roundtrip():
    cam = OrbitCamera(64, 64, r=2.0)
    cam.orbit(300.0, 150.0)
    target = cam.pose.copy()
    other = OrbitCamera(64, 64, r=5.0)
    other.update_pose(target)
    np.testing.assert_allclose(other.pose, target, atol=1e-5)


def test_nerf_engine_orbit_mode_renders():
    from tests.test_nerf_engine import CFG
    from mere_fusion_tpu.data.provider import (
        NeRFTestDataset,
        synthesize_nerf_dataset,
    )
    from mere_fusion_tpu.engines.nerf import NeRFReal
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        root = synthesize_nerf_dataset(d, hw=64)
        dataset = NeRFTestDataset.load(
            f"{root}/transforms.json", f"{root}/au.csv", scale=1.0
        )
    engine = NeRFReal(CFG, dataset=dataset)
    cam = engine.set_orbit_camera(True)
    assert cam is engine.orbit
    # camera adopted the dataset's first pose
    assert np.linalg.norm(cam.pose[:3, 3]) == pytest.approx(
        np.linalg.norm(np.asarray(dataset.poses[0])[:3, 3]), rel=1e-4
    )
    assert engine.test_step() in (True, False)
    while engine.latest_frame is None:  # skip stale-silence drops
        engine.test_step()
    frame0 = engine.latest_frame.image.copy()
    assert frame0.shape == (64, 64, 3)

    cam.orbit(2000.0, 0.0)  # large move so pixels actually change
    engine.test_step()
    while engine.latest_frame is None:
        engine.test_step()
    frame1 = engine.latest_frame.image
    assert frame1.shape == (64, 64, 3)

    engine.set_orbit_camera(False)
    assert engine.orbit is None
    assert engine.test_step() in (True, False)


def test_server_camera_route():
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from tests.test_server import make_client

    async def main():
        client = make_client()
        await client.start_server()
        try:
            r = await client.post("/start_session", json={})
            sid = (await r.json())["session_id"]
            # FakeEngine has no orbit camera → explicit error
            r = await client.post("/camera", json={"session_id": sid,
                                                   "orbit": [10, 0]})
            body = await r.json()
            assert body["code"] != 0
            assert "camera" in body["message"]
        finally:
            await client.close()

    asyncio.run(main())


def test_server_profile_route():
    import asyncio

    from tests.test_server import make_client

    async def main():
        client = make_client()
        await client.start_server()
        try:
            r = await client.get("/profile?seconds=0.2&dir=/tmp/mf_test_trace")
            body = await r.json()
            # either a trace was captured or the backend lacks profiling —
            # both are valid states, but the route must answer coherently
            if body["code"] == 0:
                assert body["data"]["trace_dir"] == "/tmp/mf_test_trace"
            else:
                assert "profiler" in body["message"]
        finally:
            await client.close()

    asyncio.run(main())
