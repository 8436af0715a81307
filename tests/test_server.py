import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from mere_fusion_tpu.asr import FakeBackend, StreamingTranscriber
from mere_fusion_tpu.brain import BrainSession, split_phrases
from mere_fusion_tpu.config import Config
from mere_fusion_tpu.llm import EchoLLM, make_llm
from mere_fusion_tpu.perception import StubPerception
from mere_fusion_tpu.server.app import create_app
from mere_fusion_tpu.server.upstream import SpeechUpstream, VideoUpstream
from tests.fakes import FakeEngine


def run(coro):
    return asyncio.run(coro)


def make_client():
    cfg = Config().override(
        **{"transport.mode": "loopback", "server.max_sessions": 2}
    )
    app = create_app(cfg, engine_factory=lambda c: FakeEngine(c), llm=EchoLLM())
    return TestClient(TestServer(app))


def test_session_lifecycle_and_routes():
    async def main():
        client = make_client()
        await client.start_server()
        try:
            r = await client.post("/start_session", json={})
            body = await r.json()
            assert r.status == 200 and body["code"] == 0
            sid = body["session_id"]

            manager = client.app["manager"]
            engine = manager.get(sid).model

            r = await client.post(
                "/talk", json={"session_id": sid, "type": "echo", "text": "hi"}
            )
            assert (await r.json())["code"] == 0
            assert engine.messages == ["hi"]

            r = await client.post(
                "/talk", json={"session_id": sid, "type": "chat", "text": "ping"}
            )
            assert (await r.json())["code"] == 0
            assert engine.messages[-1] == "You said: ping. "

            r = await client.post("/interrupt", json={"session_id": sid})
            assert (await r.json())["code"] == 0
            assert engine.paused == 1

            r = await client.post(
                "/set_audio_type",
                json={"session_id": sid, "audio_type": 2, "reinit": True},
            )
            assert engine.curr_state == 2

            r = await client.post(
                "/record", json={"session_id": sid, "type": "start_record"}
            )
            assert engine.recording
            await client.post("/record", json={"session_id": sid, "type": "end_record"})
            assert not engine.recording

            r = await client.get("/metrics")
            assert "gauges" in await r.json()

            r = await client.post("/stop_session", json={"session_id": sid})
            assert (await r.json())["code"] == 0
            r = await client.post("/interrupt", json={"session_id": sid})
            assert r.status == 404
        finally:
            await client.close()

    run(main())


def test_max_sessions_429():
    async def main():
        client = make_client()
        await client.start_server()
        try:
            for _ in range(2):
                assert (await client.post("/start_session", json={})).status == 200
            r = await client.post("/start_session", json={})
            assert r.status == 429
        finally:
            await client.close()

    run(main())


def test_split_phrases():
    chunks = ["word " * 30, "and more. ", "tail bit"]
    phrases = list(split_phrases(chunks, min_len=50))
    assert len(phrases) >= 2
    assert phrases[0].endswith(".")
    assert phrases[-1].endswith("tail bit")


def test_brain_session_pipeline():
    engine = FakeEngine()
    brain = BrainSession(engine, EchoLLM("Answer to {text}. "), min_phrase_len=5)
    brain.video_produce("a bright room")
    brain.text_produce("hello there")
    for _ in range(100):
        if engine.messages:
            break
        import time

        time.sleep(0.05)
    brain.close()
    assert engine.messages and "hello there" in " ".join(engine.messages)


def test_speech_upstream_commits_to_brain():
    class BrainSpy:
        def __init__(self):
            self.texts = []

        def text_produce(self, t):
            self.texts.append(t)

    script = [(0.2 + 0.3 * i, 0.45 + 0.3 * i, f"w{i}") for i in range(8)]
    backend = FakeBackend(script, jitter_last=False)
    st = StreamingTranscriber(backend)
    spy = BrainSpy()
    up = SpeechUpstream(st, spy, min_chunk_seconds=0.5)
    for _ in range(8):
        up.process_pcm(np.zeros(8000, np.float32))  # 0.5 s chunks
    up.finish()
    assert spy.texts, "committed text must reach the brain"


def test_video_upstream_summaries():
    class BrainSpy:
        def __init__(self):
            self.summaries = []

        def video_produce(self, s):
            self.summaries.append(s)

    spy = BrainSpy()
    up = VideoUpstream(StubPerception(fps_throttle=2), spy)
    frame = np.full((48, 64, 3), 200, np.uint8)
    for _ in range(4):
        up.process_frame(frame)
    assert len(spy.summaries) == 2
    assert "bright" in spy.summaries[0]


def test_preview_mjpeg_stream():
    """GET /preview streams multipart JPEG parts of the engine's latest
    frame (the dearpygui-viewer stand-in)."""
    async def main():
        client = make_client()
        await client.start_server()
        try:
            r = await client.post("/start_session", json={})
            sid = (await r.json())["session_id"]
            engine = client.app["manager"].get(sid).model
            from mere_fusion_tpu.transport.frames import VideoImage

            img = np.full((8, 8, 3), 128, np.uint8)
            engine.latest_frame = VideoImage(image=img)

            resp = await client.get(f"/preview?session_id={sid}&fps=50")
            assert resp.status == 200
            assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
            data = await resp.content.read(64)
            assert b"--mjpeg" in data and b"image/jpeg" in data
            resp.close()

            r = await client.get("/preview?session_id=nope")
            assert r.status == 404
        finally:
            await client.close()

    run(main())
