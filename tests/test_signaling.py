"""SRS signaling state machine against the contract-enforcing aiortc fake.

Covers the offer/answer exchange, retry/backoff, timeout exhaustion, SRS
error answers, the connection-state teardown watcher, the consume-connected
gate, and the aiortc call-order contract of docs/aiortc_contract.md
(reference: app.py:282-291, 406-478, 427-512). The fake
(tests/aiortc_fake.py) raises wherever real aiortc would, so these tests
fail if session code ever assumes something the library doesn't do.
"""
from __future__ import annotations

import asyncio
from types import SimpleNamespace

import pytest

from tests.aiortc_fake import (
    ContractFakePC,
    InternalError,
    InvalidAccessError,
    InvalidStateError,
    make_answer,
)
from mere_fusion_tpu.server.signaling import (
    attach_state_watcher,
    negotiate,
    wait_connected,
)


def make_pc(**kw):
    """A pc with one recvonly audio transceiver (createOffer needs media, C1)."""
    pc = ContractFakePC(**kw)
    pc.addTransceiver("audio", direction="recvonly")
    return pc


def test_negotiate_success():
    pc = make_pc()
    posts = []

    async def post_json(url, payload, timeout):
        posts.append((url, payload, timeout))
        return {"code": 0, "sdp": "v=0 answer"}

    asyncio.run(negotiate(pc, "http://srs/api", "webrtc://host/live/s1",
                          post_json=post_json, make_answer=make_answer))
    assert pc.localDescription.sdp == "v=0 m=audio(recvonly)"
    assert pc.remoteDescription.sdp == "v=0 answer"
    assert pc.signalingState == "stable"
    url, payload, timeout = posts[0]
    assert url == "http://srs/api"
    # request body matches the reference exactly (app.py:437-445)
    assert set(payload) == {"api", "streamurl", "clientip", "sdp", "tid",
                            "action"}
    assert payload["api"] == "http://srs/api"
    assert payload["streamurl"] == "webrtc://host/live/s1"
    assert payload["clientip"] is None
    assert payload["sdp"] == "v=0 m=audio(recvonly)"
    assert 10000 <= int(payload["tid"]) <= 99999
    assert timeout == 15.0


def test_negotiate_retries_with_backoff_then_succeeds():
    """Retries re-POST the SAME local offer; the signaling state stays
    have-local-offer across attempts so the eventual answer is legal (C2)."""
    pc = make_pc()
    sleeps, calls = [], []

    async def post_json(url, payload, timeout):
        calls.append(payload["sdp"])
        if len(calls) < 3:
            raise OSError("connection refused")
        return {"sdp": "late answer"}

    async def sleep(t):
        sleeps.append(t)

    asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                          make_answer=make_answer, sleep=sleep))
    assert len(calls) == 3 and len(set(calls)) == 1  # same offer re-POSTed
    assert sleeps == [1, 2]
    assert pc.remoteDescription.sdp == "late answer"


def test_negotiate_exhausts_and_raises():
    pc = make_pc()
    sleeps = []

    async def post_json(url, payload, timeout):
        raise asyncio.TimeoutError("slow SRS")

    async def sleep(t):
        sleeps.append(t)

    with pytest.raises(ConnectionError, match="3 attempts"):
        asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                              make_answer=make_answer, sleep=sleep))
    assert sleeps == [1, 2]  # no sleep after the final attempt
    assert pc.remoteDescription is None


def test_negotiate_rejects_sdp_less_answer():
    """An SRS error body (code != 0, no sdp) must not be applied as an
    answer — it retries and ultimately raises."""
    pc = make_pc()

    async def post_json(url, payload, timeout):
        return {"code": 400}

    async def sleep(t):
        pass

    with pytest.raises(ConnectionError, match="code=400"):
        asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                              make_answer=make_answer, sleep=sleep))
    assert pc.remoteDescription is None


# ---- aiortc contract points directly (docs/aiortc_contract.md) --------------


def test_contract_offer_requires_media():
    """C1: createOffer with no transceivers/tracks raises, like aiortc."""
    pc = ContractFakePC()

    async def post_json(url, payload, timeout):  # pragma: no cover
        return {"sdp": "x"}

    with pytest.raises(InternalError, match="no media"):
        asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                              make_answer=make_answer))


def test_contract_media_added_after_offer_missing_from_sdp():
    """C1: the offer snapshots m-lines; a track added later is absent."""
    pc = make_pc()

    async def drive():
        offer = await pc.createOffer()
        pc.addTrack(SimpleNamespace(kind="video"))
        return offer

    offer = asyncio.run(drive())
    assert "video" not in offer.sdp


def test_contract_answer_requires_have_local_offer():
    """C2: setRemoteDescription(answer) in stable raises InvalidStateError."""
    pc = make_pc()
    with pytest.raises(InvalidStateError, match="stable"):
        asyncio.run(pc.setRemoteDescription(make_answer("v=0 a")))


def test_contract_double_add_track_raises():
    """C9: a track that already has a sender is rejected."""
    pc = ContractFakePC()
    track = SimpleNamespace(kind="audio")
    pc.addTrack(track)
    with pytest.raises(InvalidAccessError):
        pc.addTrack(track)


def test_contract_closed_pc_rejects_media_and_offers():
    """C8: addTrack/createOffer after close raise InvalidStateError."""
    pc = make_pc()

    async def drive():
        await pc.close()
        await pc.close()  # idempotent
        with pytest.raises(InvalidStateError):
            pc.addTrack(SimpleNamespace(kind="audio"))
        with pytest.raises(InvalidStateError):
            await pc.createOffer()

    asyncio.run(drive())


def test_contract_track_fires_during_set_remote_description():
    """C4: recv transceivers emit track inside setRemoteDescription — a
    handler registered after negotiate would lose them."""
    pc = ContractFakePC()
    pc.addTransceiver("audio", direction="recvonly")
    pc.addTransceiver("video", direction="recvonly")
    got = []
    pc.on("track", lambda t: got.append(t.kind))

    async def post_json(url, payload, timeout):
        assert got == []  # nothing before the answer is applied
        return {"sdp": "v=0 answer"}

    asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                          make_answer=make_answer))
    assert got == ["audio", "video"]


def test_wait_connected_resolves_on_async_transition():
    """C7: connected is reached via scheduled connectionstatechange events
    after the answer — wait_connected resolves without polling."""
    pc = make_pc()

    async def post_json(url, payload, timeout):
        return {"sdp": "v=0 answer"}

    async def drive():
        await negotiate(pc, "u", "s", post_json=post_json,
                        make_answer=make_answer)
        assert pc.connectionState == "new"  # never connected synchronously
        await wait_connected(pc, timeout=1.0)
        assert pc.connectionState == "connected"

    asyncio.run(drive())


def test_wait_connected_checks_state_before_listening():
    """C7: the event won't re-fire for a state reached before the listener
    was attached — an already-connected pc must resolve immediately."""
    pc = make_pc()
    pc.connectionState = "connected"
    asyncio.run(wait_connected(pc, timeout=0.01))


def test_wait_connected_timeout_and_death():
    pc = make_pc(connect_after_answer=False)
    with pytest.raises(ConnectionError, match="not connected within"):
        asyncio.run(wait_connected(pc, timeout=0.05))

    dead = make_pc(connect_after_answer=False)

    async def drive():
        task = asyncio.ensure_future(wait_connected(dead, timeout=5.0))
        await asyncio.sleep(0)
        dead.connectionState = "failed"
        await dead.emit("connectionstatechange")
        with pytest.raises(ConnectionError, match="failed"):
            await task

    asyncio.run(drive())


def test_state_watcher_fires_once():
    pc = make_pc(connect_after_answer=False)
    dead = []
    attach_state_watcher(pc, lambda state: dead.append(state))

    async def drive():
        pc.connectionState = "connected"
        await pc.emit("connectionstatechange")
        pc.connectionState = "failed"
        await pc.emit("connectionstatechange")
        pc.connectionState = "closed"
        await pc.emit("connectionstatechange")

    asyncio.run(drive())
    assert dead == ["failed"]


def test_state_watcher_ignores_transient_disconnected():
    """'disconnected' routinely recovers (ICE blip) — the watcher must not
    tear down on it, and must still react to a later terminal state."""
    pc = make_pc(connect_after_answer=False)
    dead = []
    attach_state_watcher(pc, lambda state: dead.append(state))

    async def drive():
        pc.connectionState = "disconnected"
        await pc.emit("connectionstatechange")
        pc.connectionState = "connected"
        await pc.emit("connectionstatechange")
        pc.connectionState = "failed"
        await pc.emit("connectionstatechange")

    asyncio.run(drive())
    assert dead == ["failed"]


# ---- the full dual-PC sequence of app.py:427-512 ----------------------------


def test_session_webrtc_negotiates_both_pcs_and_tears_down(monkeypatch):
    """Session._start_webrtc against the contract fake: consume pc pulls
    stream_<sid> with recvonly m-lines in its offer, its tracks reach the
    upstream attach during negotiate, the produce negotiation starts only
    AFTER the consume pc connects (app.py:471-478), and a failed connection
    closes the session exactly once (app.py:406-478)."""
    import mere_fusion_tpu.server.upstream as upstream
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.server.sessions import Session

    cfg = Config().override(**{"transport.mode": "webrtc"})
    session = Session("s7", engine=SimpleNamespace(), cfg=cfg)
    session.player = SimpleNamespace(audio=SimpleNamespace(kind="audio"),
                                     video=SimpleNamespace(kind="video"),
                                     stop=lambda: None)
    attached = []
    monkeypatch.setattr(upstream, "attach_upstream_track",
                        lambda sess, track: attached.append(track.kind))
    pcs = []

    def pc_factory():
        pc = ContractFakePC()
        pcs.append(pc)
        return pc

    posts = []

    async def post_json(url, payload, timeout):
        posts.append((url, payload["streamurl"], payload["sdp"],
                      pcs[0].connectionState))
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
        # consume offer declared both recvonly m-lines (C1)
        assert "m=audio(recvonly)" in posts[0][2]
        assert "m=video(recvonly)" in posts[0][2]
        # both remote tracks were delivered during the consume negotiate (C4)
        assert attached == ["audio", "video"]
        # produce offer carried the player's tracks (C1)
        assert "send" in posts[1][2]
        # produce POST happened only after the consume pc connected
        assert posts[1][3] == "connected"
        assert session._pcs == [consume, produce]
        # connection dies -> session torn down exactly once
        consume.connectionState = "failed"
        await consume.emit("connectionstatechange")
        await consume.emit("connectionstatechange")

    asyncio.run(drive())
    assert [s for _, s, _, _ in posts] == [
        "webrtc://localhost/live/stream_s7",
        "webrtc://localhost/live/processed_stream_s7"]
    assert posts[0][0] == cfg.transport.pull_url
    assert posts[1][0] == cfg.transport.push_url
    assert closed == [True]


def test_session_webrtc_consume_never_connects_tears_down():
    """app.py:471-478: if the pull side never reaches connected within the
    timeout, the session start fails (start()'s close-on-failure path owns
    the cleanup)."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.server.sessions import Session

    cfg = Config().override(**{"transport.mode": "webrtc",
                               "transport.connect_timeout": 0.05})
    session = Session("s9", engine=SimpleNamespace(), cfg=cfg)
    session.player = SimpleNamespace(audio=SimpleNamespace(kind="audio"),
                                     video=SimpleNamespace(kind="video"),
                                     stop=lambda: None)
    pcs = []

    def pc_factory():
        pc = ContractFakePC(connect_after_answer=False)
        pcs.append(pc)
        return pc

    async def post_json(url, payload, timeout):
        return {"sdp": "answer"}

    async def drive():
        with pytest.raises(ConnectionError, match="not connected"):
            await session._start_webrtc(pc_factory=pc_factory,
                                        post_json=post_json,
                                        make_answer=make_answer)
        assert len(pcs) == 1  # produce pc never built
        assert pcs[0] in session._pcs  # close() can still reach it
        await session.close()
        assert pcs[0].closed

    asyncio.run(drive())


def test_failed_produce_negotiation_still_closes_consume_pc():
    """If the produce-side negotiation exhausts its retries, the already
    negotiated consume pc must be reachable from close() — not leaked with a
    live SRS pull stream (regression: _pcs was only assigned after BOTH
    negotiations)."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.server.sessions import Session

    cfg = Config().override(**{"transport.mode": "webrtc"})
    session = Session("s8", engine=SimpleNamespace(), cfg=cfg)
    session.player = SimpleNamespace(audio=SimpleNamespace(kind="audio"),
                                     video=SimpleNamespace(kind="video"),
                                     stop=lambda: None)
    pcs = []

    def pc_factory():
        pc = ContractFakePC()
        pcs.append(pc)
        return pc

    calls = {"n": 0}

    async def post_json(url, payload, timeout):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"sdp": "answer"}      # consume succeeds
        raise OSError("SRS push down")    # every produce attempt fails

    async def drive():
        with pytest.raises(ConnectionError):
            await session._start_webrtc(pc_factory=pc_factory,
                                        post_json=post_json,
                                        make_answer=make_answer)
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


# ---- SRS response replay fixtures (VERDICT r3 item 5) ------------------------
# Documented SRS /rtc/v1/play + /rtc/v1/publish HTTP response bodies (the SRS
# 4/5 RTC HTTP API), replayed through negotiate()'s response handling — the
# half of the live seam testable without aiortc. Reference behavior mirrored:
# app.py:452-461 (`res.get('code') and res['code'] != 0` → fail; res['sdp']
# → RTCSessionDescription).

SRS_FIXTURES = {
    # happy path: code 0 + server id + session id + full sdp answer
    "play_ok": {
        "code": 0,
        "server": "vid-k2918w2",
        "sdp": ("v=0\r\no=SRS/5.0.213 112 2 IN IP4 0.0.0.0\r\ns=SRSPlay\r\n"
                "t=0 0\r\nm=audio 9 UDP/TLS/RTP/SAVPF 111\r\n"),
        "sessionid": "k2918w2:FY0G9Y9S",
    },
    "publish_ok": {
        "code": 0,
        "server": "vid-k2918w2",
        "sdp": ("v=0\r\no=SRS/5.0.213 112 2 IN IP4 0.0.0.0\r\n"
                "s=SRSPublish\r\nt=0 0\r\nm=video 9 UDP/TLS/RTP/SAVPF 106\r\n"),
        "sessionid": "k2918w2:2J9R1M5K",
    },
    # SRS error bodies: bare code (the common shape), code+msg (SRS 5)
    "error_bare_code": {"code": 400},
    "error_code_msg": {"code": 2049, "msg": "no stream found"},
    # stream busy: publish against an already-published stream
    "error_busy": {"code": 1028, "server": "vid-k2918w2",
                   "msg": "stream busy"},
    # malformed answers seen from proxies/misconfig: sdp wrong type, empty
    # sdp, missing sdp with code 0, non-object body
    "malformed_sdp_null": {"code": 0, "sdp": None},
    "malformed_sdp_empty": {"code": 0, "sdp": ""},
    "malformed_no_sdp": {"code": 0, "server": "vid-k2918w2"},
    "malformed_not_object": ["not", "a", "dict"],
}


def _replay(body, n: int = 1):
    """Drive negotiate() with a canned SRS response; returns (pc, attempts)."""
    pc = make_pc()
    attempts = []

    async def post_json(url, payload, timeout):
        attempts.append(payload)
        return body

    async def no_sleep(_s):
        return None

    asyncio.run(negotiate(pc, "http://srs/rtc/v1/play/",
                          "webrtc://host/live/s1", post_json=post_json,
                          make_answer=make_answer, retries=n,
                          sleep=no_sleep, action="play"))
    return pc, attempts


def test_srs_replay_success_bodies():
    for name in ("play_ok", "publish_ok"):
        pc, attempts = _replay(SRS_FIXTURES[name])
        assert pc.remoteDescription.sdp == SRS_FIXTURES[name]["sdp"]
        assert pc.signalingState == "stable"
        assert len(attempts) == 1
        assert attempts[0]["action"] == "play"


@pytest.mark.parametrize("name", ["error_bare_code", "error_code_msg",
                                  "error_busy"])
def test_srs_replay_error_codes_fail_without_touching_pc(name):
    with pytest.raises(ConnectionError) as ei:
        _replay(SRS_FIXTURES[name], n=2)
    assert f"code={SRS_FIXTURES[name]['code']!r}" in str(ei.value)


@pytest.mark.parametrize("name", ["malformed_sdp_null", "malformed_sdp_empty",
                                  "malformed_no_sdp", "malformed_not_object"])
def test_srs_replay_malformed_answers_fail(name):
    with pytest.raises(ConnectionError):
        _replay(SRS_FIXTURES[name], n=2)


def test_srs_replay_error_then_recovery_retries():
    """A transient SRS error followed by a good answer: negotiate retries
    (app.py:282-291 backoff) and completes on the recovered body."""
    pc = make_pc()
    bodies = [SRS_FIXTURES["error_bare_code"], SRS_FIXTURES["play_ok"]]
    sleeps = []

    async def post_json(url, payload, timeout):
        return bodies.pop(0)

    async def fake_sleep(s):
        sleeps.append(s)

    asyncio.run(negotiate(pc, "u", "s", post_json=post_json,
                          make_answer=make_answer, retries=3,
                          sleep=fake_sleep))
    assert pc.remoteDescription.sdp == SRS_FIXTURES["play_ok"]["sdp"]
    assert sleeps == [1]
