"""SRS signaling state machine with fake peer connections (aiortc absent).

Covers the offer/answer exchange, retry/backoff, timeout exhaustion, SRS
error answers, and the connection-state teardown watcher
(reference: app.py:282-291, 406-478, 434-512).
"""
from __future__ import annotations

import asyncio
from types import SimpleNamespace

import pytest

from mere_fusion_tpu.server.signaling import attach_state_watcher, negotiate


class FakePC:
    def __init__(self):
        self.handlers = {}
        self.local = None
        self.remote = None
        self.transceivers = []
        self.tracks = []
        self.connectionState = "new"
        self.closed = False

    async def createOffer(self):
        return SimpleNamespace(sdp="v=0 offer", type="offer")

    async def setLocalDescription(self, desc):
        self.local = desc

    @property
    def localDescription(self):
        return self.local

    async def setRemoteDescription(self, desc):
        self.remote = desc

    def addTransceiver(self, kind, direction=None):
        self.transceivers.append((kind, direction))

    def addTrack(self, track):
        self.tracks.append(track)

    def on(self, name):
        def deco(fn):
            self.handlers[name] = fn
            return fn

        return deco

    async def fire(self, name):
        result = self.handlers[name]()
        if asyncio.iscoroutine(result):
            await result

    async def close(self):
        self.closed = True


def make_answer(sdp):
    return SimpleNamespace(sdp=sdp, type="answer")


def test_negotiate_success():
    pc = FakePC()
    posts = []

    async def post_json(url, payload, timeout):
        posts.append((url, payload, timeout))
        return {"code": 0, "sdp": "v=0 answer"}

    asyncio.run(negotiate(pc, "http://srs/api", "webrtc://host/live/s1",
                          post_json=post_json, make_answer=make_answer))
    assert pc.local.sdp == "v=0 offer"
    assert pc.remote.sdp == "v=0 answer" and pc.remote.type == "answer"
    url, payload, timeout = posts[0]
    assert url == "http://srs/api"
    assert payload == {"api": "http://srs/api",
                       "streamurl": "webrtc://host/live/s1",
                       "sdp": "v=0 offer"}
    assert timeout == 15.0


def test_negotiate_retries_with_backoff_then_succeeds():
    pc = FakePC()
    sleeps, calls = [], [0]

    async def post_json(url, payload, timeout):
        calls[0] += 1
        if calls[0] < 3:
            raise OSError("connection refused")
        return {"sdp": "late answer"}

    async def sleep(t):
        sleeps.append(t)

    asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                          make_answer=make_answer, sleep=sleep))
    assert calls[0] == 3
    assert sleeps == [1, 2]
    assert pc.remote.sdp == "late answer"


def test_negotiate_exhausts_and_raises():
    pc = FakePC()
    sleeps = []

    async def post_json(url, payload, timeout):
        raise asyncio.TimeoutError("slow SRS")

    async def sleep(t):
        sleeps.append(t)

    with pytest.raises(ConnectionError, match="3 attempts"):
        asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                              make_answer=make_answer, sleep=sleep))
    assert sleeps == [1, 2]  # no sleep after the final attempt
    assert pc.remote is None


def test_negotiate_rejects_sdp_less_answer():
    """An SRS error body (code != 0, no sdp) must not be applied as an
    answer — it retries and ultimately raises."""
    pc = FakePC()

    async def post_json(url, payload, timeout):
        return {"code": 400}

    async def sleep(t):
        pass

    with pytest.raises(ConnectionError, match="missing sdp"):
        asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                              make_answer=make_answer, sleep=sleep))
    assert pc.remote is None


def test_state_watcher_fires_once():
    pc = FakePC()
    dead = []
    attach_state_watcher(pc, lambda state: dead.append(state))

    async def drive():
        pc.connectionState = "connected"
        await pc.fire("connectionstatechange")
        pc.connectionState = "failed"
        await pc.fire("connectionstatechange")
        pc.connectionState = "closed"
        await pc.fire("connectionstatechange")

    asyncio.run(drive())
    assert dead == ["failed"]


def test_session_webrtc_negotiates_both_pcs_and_tears_down():
    """Session._start_webrtc with fakes: consume pc pulls stream_<sid>,
    produce pc pushes processed_stream_<sid>; a failed connection closes
    the session (reference app.py:406-478)."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.server.sessions import Session

    cfg = Config().override(**{"transport.mode": "webrtc"})
    session = Session("s7", engine=SimpleNamespace(), cfg=cfg)
    session.player = SimpleNamespace(audio="ATRACK", video="VTRACK",
                                     stop=lambda: None)
    pcs = []

    def pc_factory():
        pc = FakePC()
        pcs.append(pc)
        return pc

    posts = []

    async def post_json(url, payload, timeout):
        posts.append((url, payload["streamurl"]))
        return {"sdp": "answer"}

    closed = []

    async def fake_close():
        closed.append(True)

    session.close = fake_close

    async def drive():
        await session._start_webrtc(pc_factory=pc_factory,
                                    post_json=post_json,
                                    make_answer=make_answer)
        consume, produce = pcs
        assert consume.transceivers == [("audio", "recvonly"),
                                        ("video", "recvonly")]
        assert "track" in consume.handlers
        assert produce.tracks == ["ATRACK", "VTRACK"]
        assert session._pcs == [consume, produce]
        # connection dies -> session torn down exactly once
        consume.connectionState = "failed"
        await consume.fire("connectionstatechange")
        await consume.fire("connectionstatechange")

    asyncio.run(drive())
    assert [s for _, s in posts] == ["webrtc://localhost/live/stream_s7",
                                     "webrtc://localhost/live/processed_stream_s7"]
    assert posts[0][0] == cfg.transport.pull_url
    assert posts[1][0] == cfg.transport.push_url
    assert closed == [True]


def test_state_watcher_ignores_transient_disconnected():
    """'disconnected' routinely recovers (ICE blip) — the watcher must not
    tear down on it, and must still react to a later terminal state."""
    pc = FakePC()
    dead = []
    attach_state_watcher(pc, lambda state: dead.append(state))

    async def drive():
        pc.connectionState = "disconnected"
        await pc.fire("connectionstatechange")
        pc.connectionState = "connected"
        await pc.fire("connectionstatechange")
        pc.connectionState = "failed"
        await pc.fire("connectionstatechange")

    asyncio.run(drive())
    assert dead == ["failed"]


def test_failed_produce_negotiation_still_closes_consume_pc():
    """If the produce-side negotiation exhausts its retries, the already
    negotiated consume pc must be reachable from close() — not leaked with a
    live SRS pull stream (regression: _pcs was only assigned after BOTH
    negotiations)."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.server.sessions import Session

    cfg = Config().override(**{"transport.mode": "webrtc"})
    session = Session("s8", engine=SimpleNamespace(), cfg=cfg)
    session.player = SimpleNamespace(audio="A", video="V", stop=lambda: None)
    pcs = []

    def pc_factory():
        pc = FakePC()
        pcs.append(pc)
        return pc

    calls = {"n": 0}

    async def post_json(url, payload, timeout):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"sdp": "answer"}      # consume succeeds
        raise OSError("SRS push down")    # every produce attempt fails

    async def sleep(t):
        pass

    async def drive():
        import mere_fusion_tpu.server.signaling as sig
        orig = sig.negotiate

        async def fast_negotiate(pc, api, stream, **kw):
            return await orig(pc, api, stream, sleep=sleep, **kw)

        sig_negotiate = fast_negotiate
        try:
            # patch the retry sleep out via module attribute
            sig.negotiate, saved = sig_negotiate, sig.negotiate
            with pytest.raises(ConnectionError):
                await session._start_webrtc(pc_factory=pc_factory,
                                            post_json=post_json,
                                            make_answer=make_answer)
        finally:
            sig.negotiate = saved
        assert pcs[0] in session._pcs and pcs[1] in session._pcs
        await session.close()
        assert pcs[0].closed and pcs[1].closed

    asyncio.run(drive())


def test_watcher_death_deregisters_from_manager():
    """Connection death must release the manager slot and the active gauge,
    not just close the session (regression: close() without deregistration
    ate max_sessions slots until the server rejected everyone). Double
    discard/stop must not double-close."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.server.sessions import Session, SessionManager

    cfg = Config().override(
        **{"transport.mode": "loopback", "server.max_sessions": 1})
    mgr = SessionManager(cfg, engine_factory=lambda c: SimpleNamespace())

    closes = []

    async def drive():
        sid = "sX"
        session = Session(sid, engine=SimpleNamespace(), cfg=cfg)
        session.player = SimpleNamespace(stop=lambda: closes.append("stop"))
        session._manager_discard = lambda: mgr.stop_session(sid)
        mgr.sessions[sid] = session
        assert len(mgr.sessions) == 1
        await session.discard()           # what the state watcher runs
        assert mgr.sessions == {}         # slot released
        assert closes == ["stop"]
        await session.discard()           # idempotent
        await session.close()
        assert closes == ["stop"]

    asyncio.run(drive())
