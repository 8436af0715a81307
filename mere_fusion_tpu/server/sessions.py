"""Per-user sessions: engine + media transport lifecycle.

Equivalent of the reference's ConnectSession/session bookkeeping
(reference: app.py:42-97, 312-531). Transports:

- "loopback": in-process — tracks are drained by a consumer task at the
  paced rate (tests, demos, and environments without aiortc);
- "webrtc": dual RTCPeerConnection against an SRS relay (pull the caller's
  stream, push the avatar stream), HTTP-API signaling with retry/backoff.
"""
from __future__ import annotations

import asyncio
import logging
from typing import Optional

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.runtime.metrics import metrics
from mere_fusion_tpu.transport.tracks import HumanPlayer

logger = logging.getLogger(__name__)


class CapacityError(RuntimeError):
    """Session admission refused: max_sessions reached (reference 429,
    app.py:79-80)."""


class Session:
    def __init__(self, session_id: str, engine, cfg: Config, llm=None,
                 asr_backend=None, perception=None):
        self.session_id = session_id
        self.model = engine          # reference name for the engine
        self.cfg = cfg
        self.llm = llm
        self._asr_backend = asr_backend
        self._perception = perception
        self.player: Optional[HumanPlayer] = None
        # jax.Device this session is placed on (set by SessionManager);
        # None = process default device
        self.device = getattr(engine, "device", None)
        self.brain = None
        self.speech_upstream = None
        self.video_upstream = None
        self._consumers: list[asyncio.Task] = []
        self._pcs: list = []
        self._closed = False
        # set by SessionManager: async () -> bool, removes this session from
        # the manager's registry and closes it (the reference "discards" the
        # session on connection death, app.py:406-478 — close alone would
        # leak the max_sessions slot and the active gauge)
        self._manager_discard = None

    def ensure_upstream(self) -> None:
        """Build the cognition plane lazily (first incoming track): incoming
        speech/video drive the brain, which speaks through the engine. The
        ASR backend construction compiles the whisper encoder, so it only
        happens when a caller actually connects."""
        if self.llm is None or self.speech_upstream is not None:
            return
        from mere_fusion_tpu.asr import StreamingTranscriber, make_backend
        from mere_fusion_tpu.brain import BrainSession
        from mere_fusion_tpu.server.upstream import SpeechUpstream, VideoUpstream

        if self.brain is None:
            self.brain = BrainSession(self.model, self.llm)
        # the streaming-ASR whisper encoder belongs on the session's chip
        # too: its weights are committed there so transcription dispatched
        # from the shared event loop doesn't pile every session onto chip 0
        asr_kw = {"device": self.device}
        if self.cfg.asr.backend == "jax-whisper":
            asr_kw.update(language=self.cfg.asr.language,
                          beam_size=self.cfg.asr.beam_size)
        backend = self._asr_backend or make_backend(
            self.cfg.asr.backend, **asr_kw
        )
        transcriber = StreamingTranscriber(
            backend, buffer_trimming=("segment", self.cfg.asr.buffer_trim_seconds)
        )
        self.speech_upstream = SpeechUpstream(
            transcriber, self.brain,
            min_chunk_seconds=self.cfg.asr.min_chunk_seconds,
        )
        self.video_upstream = VideoUpstream(
            self._perception or self._build_perception(), self.brain
        )

    def _build_perception(self):
        """Perception backend from config: the flax YOLOv10 summarizer runs
        on this session's placed chip; detectors build lazily here (first
        incoming track), never on the session-start critical path."""
        from mere_fusion_tpu.perception import (make_perception,
                                                 parse_perception_spec)

        p = self.cfg.perception
        if p.backend in ("yolo-tpu", "yolo_tpu"):
            return make_perception(
                p.backend, ckpt=p.ckpt or None, scale=p.scale,
                fps_throttle=p.fps_throttle, conf=p.conf, device=self.device,
                face_attrs=parse_perception_spec(p.face_attrs),
                ocr=parse_perception_spec(p.ocr))
        if p.backend == "yolo":
            kw = {"model_path": p.ckpt} if p.ckpt else {}
            return make_perception("yolo", fps_throttle=p.fps_throttle, **kw)
        return make_perception("stub", fps_throttle=p.fps_throttle)

    async def start(self) -> None:
        mode = self.cfg.transport.mode
        self.player = HumanPlayer(self.model)
        try:
            if mode == "loopback":
                self._consumers = [
                    asyncio.create_task(self._drain(self.player.audio)),
                    asyncio.create_task(self._drain(self.player.video)),
                ]
            elif mode == "webrtc":
                await self._start_webrtc()
            elif mode == "rtmp":
                await self._start_rtmp()
            elif mode == "rtp":
                await self._start_rtp()
            else:
                raise ValueError(f"unsupported transport mode {mode!r}")
        except Exception:
            # half-built transports (e.g. a negotiated consume_pc when the
            # produce negotiation fails) must not leak live connections
            await self.close()
            raise
        metrics.counter("sessions.started")

    # ---- RTMP push (reference app.py:699, nerfreal.py:89-124 — vestigial
    # there; a working ffmpeg-piped implementation here) ----------------------
    async def _start_rtmp(self) -> None:
        from mere_fusion_tpu.transport.rtmp import RtmpStreamer, RtmpTrackSink

        probe = self.model.first_video_frame_shape()
        streamer = RtmpStreamer(
            self.cfg.transport.push_url, width=probe[1], height=probe[0],
            fps=self.cfg.audio.fps, sample_rate=self.cfg.audio.sample_rate,
        )
        self._rtmp = streamer
        sink = RtmpTrackSink(streamer)
        import threading

        quit_event = threading.Event()
        self._consumers = [
            asyncio.create_task(
                sink.run(self.player.video, self.player.audio, quit_event)
            )
        ]

    # ---- native RTP push (no ffmpeg/aiortc: L16 audio + RFC 4175 video over
    # UDP, RTCP SRs on port+1 — the rtp analog of the reference's
    # rtmp/rtcpush transports, app.py:699) ------------------------------------
    async def _start_rtp(self) -> None:
        import threading

        from mere_fusion_tpu.transport.rtp_send import RtpSender, RtpTrackSink

        t = self.cfg.transport
        sender = RtpSender(t.rtp_host, t.rtp_audio_port, t.rtp_video_port)
        self._rtp = sender
        sink = RtpTrackSink(sender)
        quit_event = threading.Event()
        self._consumers = [
            asyncio.create_task(
                sink.run(self.player.video, self.player.audio, quit_event)
            )
        ]

    async def _drain(self, track) -> None:
        try:
            while True:
                await track.recv()
        except (ConnectionError, asyncio.CancelledError):
            pass

    # ---- WebRTC against SRS (reference app.py:395-531) -----------------------
    async def _start_webrtc(self, pc_factory=None, post_json=None,
                            make_answer=None) -> None:
        """Dual peer connection: pull the caller's stream, push the avatar's.

        pc_factory/post_json/make_answer are injectable for tests (the
        signaling state machine is exercised with fakes — aiortc absent);
        production defaults to aiortc + aiohttp.
        """
        from mere_fusion_tpu.server.signaling import (
            attach_state_watcher,
            negotiate,
            wait_connected,
        )

        if pc_factory is None:
            from aiortc import RTCPeerConnection

            pc_factory = RTCPeerConnection

        sid = self.session_id

        def on_dead(state: str):
            return self.discard()

        # pull the caller's stream
        consume_pc = pc_factory()
        self._pcs.append(consume_pc)  # registered pre-negotiation: a failed
        # later step must still reach this pc on close()
        consume_pc.addTransceiver("audio", direction="recvonly")
        consume_pc.addTransceiver("video", direction="recvonly")

        @consume_pc.on("track")
        def on_track(track):
            from mere_fusion_tpu.server.upstream import attach_upstream_track

            attach_upstream_track(self, track)

        attach_state_watcher(consume_pc, on_dead, label=f"consume/{sid}")
        await negotiate(
            consume_pc, self.cfg.transport.pull_url,
            f"webrtc://localhost/live/stream_{sid}",
            post_json=post_json, make_answer=make_answer,
        )

        # the produce negotiation only starts once the pull side actually
        # connects (reference app.py:471-478); timeout/death propagates to
        # start()'s close-on-failure path
        await wait_connected(consume_pc,
                             timeout=self.cfg.transport.connect_timeout)

        # push the avatar stream
        produce_pc = pc_factory()
        self._pcs.append(produce_pc)
        produce_pc.addTrack(self.player.audio)
        produce_pc.addTrack(self.player.video)
        attach_state_watcher(produce_pc, on_dead, label=f"produce/{sid}")
        await negotiate(
            produce_pc, self.cfg.transport.push_url,
            f"webrtc://localhost/live/processed_stream_{sid}",
            post_json=post_json, make_answer=make_answer,
        )

    async def discard(self) -> None:
        """Close AND deregister (the connection-death path): via the manager
        when registered there, so the max_sessions slot and the active gauge
        are released; falls back to a bare close for unmanaged sessions or
        deaths that race session startup."""
        if self._manager_discard is not None:
            if await self._manager_discard():
                return
        await self.close()

    async def close(self) -> None:
        if self._closed:  # idempotent: watcher teardown may race stop_session
            return
        self._closed = True
        for task in self._consumers:
            task.cancel()
        if getattr(self, "_rtmp", None) is not None:
            self._rtmp.close()
        if getattr(self, "_rtp", None) is not None:
            self._rtp.close()
        for pc in self._pcs:
            await pc.close()
        if self.player is not None:
            self.player.stop()
        if self.brain is not None:
            self.brain.close()
        metrics.counter("sessions.closed")


class SessionManager:
    def __init__(self, cfg: Config, engine_factory, llm=None):
        self.cfg = cfg
        self.engine_factory = engine_factory
        self.llm = llm
        self.sessions: dict[str, Session] = {}
        self._starting: set[str] = set()  # admission-counted while building
        self.lock = asyncio.Lock()
        self.placer = None  # built lazily: importing jax at server
        # construction would pay backend init even for signaling-only tests

    def _ensure_placer(self):
        if self.placer is None:
            import math

            import jax

            from mere_fusion_tpu.parallel.placement import DevicePlacer

            # per-device cap sized so the GLOBAL max_sessions stays the only
            # admission limit (reference: app.py:42-49, 705); least-loaded
            # acquire then balances sessions across the host's chips
            n = max(1, len(jax.devices()))
            self.placer = DevicePlacer(
                max_sessions_per_device=max(
                    1, math.ceil(self.cfg.server.max_sessions / n))
            )
        return self.placer

    def _build_engine(self, device):
        """Call the factory under the placed device's dispatch scope, passing
        device= through when the factory accepts it (engines commit their
        weights there); plain cfg-only factories still construct pinned."""
        import inspect

        import jax

        factory = self.engine_factory
        try:
            params = inspect.signature(factory).parameters
            accepts_device = "device" in params or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in params.values()
            )
        except (TypeError, ValueError):
            accepts_device = False
        with jax.default_device(device):
            if accepts_device:
                return factory(self.cfg, device=device)
            engine = factory(self.cfg)
        # cfg-only factories: the engine was BUILT pinned, but without
        # engine.device its thread scopes would be no-ops and uncommitted
        # weights would migrate back to device 0 at steady state — pin
        # engines that follow the BaseReal contract (device attr, None)
        if getattr(engine, "device", False) is None:
            engine.device = device
        return engine

    async def start_session(self) -> Session:
        import uuid

        placer = self._ensure_placer()
        async with self.lock:
            if (len(self.sessions) + len(self._starting)
                    >= self.cfg.server.max_sessions):
                raise CapacityError("max sessions")
            sid = str(uuid.uuid4())
            self._starting.add(sid)
            device = placer.acquire(sid)
        try:
            # the engine build blocks for seconds-to-minutes (jit warmups,
            # remote compiles) — run it off-loop, lock dropped, so already
            # -live sessions keep streaming while a new caller joins
            loop = asyncio.get_running_loop()
            engine = await loop.run_in_executor(
                None, self._build_engine, device)
            session = Session(sid, engine, self.cfg, llm=self.llm)
            session.device = device
            session._manager_discard = lambda: self.stop_session(sid)
            await session.start()
            async with self.lock:
                self._starting.discard(sid)
                if session._closed:
                    # a connection-state watcher fired between start() and
                    # registration: its discard() found nothing to deregister
                    # and bare-closed the session — don't register a corpse
                    placer.release(sid)
                    raise RuntimeError("session died during startup")
                self.sessions[sid] = session
                metrics.gauge("sessions.active", len(self.sessions))
                self._publish_placement()
            return session
        except BaseException:
            async with self.lock:
                if sid in self._starting:
                    self._starting.discard(sid)
                    placer.release(sid)
            raise

    async def stop_session(self, session_id: str) -> bool:
        async with self.lock:
            session = self.sessions.pop(session_id, None)
            if session is None:
                return False
            await session.close()
            # release AFTER close: the dying engine's weights and in-flight
            # dispatches still occupy its chip's HBM until then — freeing the
            # slot earlier would let a new session commit a full model onto
            # the same chip while the old one is still live
            if self.placer is not None:
                self.placer.release(session_id)
                self._publish_placement()
            metrics.gauge("sessions.active", len(self.sessions))
            return True

    def _publish_placement(self) -> None:
        """Per-chip session counts on /metrics (placement observability)."""
        counts = self.placer.counts()
        for i, dev in enumerate(self.placer.devices):
            metrics.gauge(f"sessions.device{i}", counts[dev])

    def get(self, session_id: str) -> Optional[Session]:
        return self.sessions.get(session_id)

    async def close_all(self) -> None:
        for sid in list(self.sessions):
            await self.stop_session(sid)
