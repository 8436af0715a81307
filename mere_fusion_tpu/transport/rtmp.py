"""RTMP push through an ffmpeg subprocess.

The reference exposes `--transport rtmp` and calls
`self.streamer.stream_frame(...)` / `stream_frame_audio(...)`
(reference: nerfreal.py:89-124, app.py:699-701, 746) but never constructs
the streamer — the path is vestigial from an upstream compiled
`rtmp_streaming` module. This is a working equivalent with the same two-call
API: raw BGR frames and float32 PCM are piped into one ffmpeg process that
muxes H.264+AAC into an FLV stream and pushes it to the RTMP URL.

Audio rides a named FIFO (ffmpeg needs two independent inputs; only one can
be stdin). `ffmpeg_path` is injectable so tests can substitute a recorder
script. Without ffmpeg the streamer falls back to a pure-python RTMP client
publishing Screen Video v1 + PCM16 (transport/rtmp_native, transport/flv) —
heavier bitrate than H.264+AAC but fully dependency-free.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import threading

import numpy as np


class RtmpStreamer:
    """Push raw video frames + PCM audio to an RTMP endpoint.

    stream_frame(image)        — BGR uint8 [H, W, 3], paced by the caller
    stream_frame_audio(chunk)  — float32 PCM at `sample_rate`, mono
    close()                    — flush and terminate the pipeline
    """

    def __init__(self, url: str, width: int, height: int, fps: int = 25,
                 sample_rate: int = 16000, bitrate: str = "2000k",
                 ffmpeg_path: str | None = None, force_native: bool = False):
        self.width, self.height = width, height
        ffmpeg = None if force_native else (ffmpeg_path or shutil.which("ffmpeg"))
        if ffmpeg is None:
            # dependency-free fallback: own RTMP client + Screen Video/PCM
            # muxing (transport/rtmp_native, transport/flv). H.264+AAC needs
            # ffmpeg; Screen Video costs more bitrate but every stock
            # server/player handles it.
            from mere_fusion_tpu.transport.flv import FlvPacketizer
            from mere_fusion_tpu.transport.rtmp_native import RtmpPublisher

            self._pub = RtmpPublisher(url)
            self._pkt = FlvPacketizer(width, height, fps, sample_rate,
                                      gop=2 * fps)
            self._pub.send_metadata(self._pkt.metadata())
            self._lock = threading.Lock()
            self._proc = None
            return
        self._pub = None
        self._tmp = tempfile.mkdtemp(prefix="mf_rtmp_")
        self._fifo = os.path.join(self._tmp, "audio.pcm")
        os.mkfifo(self._fifo)
        self._proc = subprocess.Popen(
            [
                ffmpeg, "-loglevel", "error", "-re",
                # video: raw BGR frames on stdin
                "-f", "rawvideo", "-pix_fmt", "bgr24",
                "-s", f"{width}x{height}", "-r", str(fps), "-i", "pipe:0",
                # audio: raw PCM16 mono through the fifo
                "-f", "s16le", "-ar", str(sample_rate), "-ac", "1",
                "-i", self._fifo,
                "-c:v", "libx264", "-preset", "ultrafast",
                "-tune", "zerolatency", "-b:v", bitrate,
                "-pix_fmt", "yuv420p", "-g", str(2 * fps),
                "-c:a", "aac", "-ar", str(sample_rate),
                "-f", "flv", url,
            ],
            stdin=subprocess.PIPE,
        )
        # opening a fifo for write blocks until the reader opens it; do it on
        # a thread so construction doesn't deadlock if ffmpeg dies early
        self._audio_fh = None
        self._audio_ready = threading.Event()
        self._audio_failed = False

        def _open_fifo():
            try:
                self._audio_fh = open(self._fifo, "wb")
            except OSError:
                self._audio_fh = None
            self._audio_ready.set()

        threading.Thread(target=_open_fifo, daemon=True).start()
        self._lock = threading.Lock()

    def stream_frame(self, image: np.ndarray) -> None:
        if image.shape[:2] != (self.height, self.width):
            raise ValueError(
                f"frame {image.shape[:2]} != configured "
                f"{(self.height, self.width)}"
            )
        if self._pub is not None:
            with self._lock:
                _tag, ts, body = self._pkt.video_tag(image)
                self._pub.send_video(body, ts)
            return
        with self._lock:
            if self._proc.poll() is None:
                self._proc.stdin.write(np.ascontiguousarray(image).tobytes())

    def stream_frame_audio(self, chunk: np.ndarray) -> None:
        if self._pub is not None:
            with self._lock:
                _tag, ts, body = self._pkt.audio_tag(chunk)
                self._pub.send_audio(body, ts)
            return
        # wait generously for a cold ffmpeg to open the fifo (silently
        # dropping audio until then would desync the stream permanently),
        # but poll process liveness so a dead ffmpeg — which never opens the
        # fifo — fails each call in ~1 s instead of stalling 30 s per chunk
        if self._audio_failed:
            if self._proc.poll() is None and self._audio_ready.is_set():
                # slow-open recovery: ffmpeg finally opened the fifo after
                # the latch — resume audio instead of muting the stream
                self._audio_failed = False
            else:
                return
        deadline = 30.0
        while not self._audio_ready.wait(timeout=min(1.0, deadline)):
            deadline -= 1.0
            if self._proc.poll() is not None or deadline <= 0:
                import logging

                self._audio_failed = True  # latch: don't re-wait per chunk
                logging.getLogger(__name__).warning(
                    "rtmp audio fifo not ready (ffmpeg %s) — dropping audio",
                    "exited" if self._proc.poll() is not None else "slow")
                return
        if self._audio_fh is None:
            return
        pcm = np.clip(chunk, -1.0, 1.0)
        self._audio_fh.write((pcm * 32767).astype(np.int16).tobytes())

    def close(self) -> None:
        if self._pub is not None:
            self._pub.close()
            return
        with self._lock:
            if self._proc.stdin and not self._proc.stdin.closed:
                try:
                    self._proc.stdin.close()
                except BrokenPipeError:
                    pass
        # the opener thread may still be inside open(); give it a moment so
        # the reader sees a clean EOF instead of a leaked writer
        self._audio_ready.wait(timeout=1)
        if self._audio_fh is not None:
            try:
                self._audio_fh.close()
            except BrokenPipeError:
                pass
        try:
            self._proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            self._proc.kill()
        shutil.rmtree(self._tmp, ignore_errors=True)


class RtmpTrackSink:
    """Adapter that drains HumanPlayer-style paced tracks into an
    RtmpStreamer — lets any engine's render() output (VideoImage /
    AudioChunk frames) feed an RTMP push instead of WebRTC."""

    def __init__(self, streamer: RtmpStreamer):
        self.streamer = streamer

    async def run(self, video_track, audio_track, quit_event) -> None:
        import asyncio

        async def pump_video():
            while not quit_event.is_set():
                frame = await video_track.recv()
                self.streamer.stream_frame(frame.image)

        async def pump_audio():
            while not quit_event.is_set():
                chunk = await audio_track.recv()
                self.streamer.stream_frame_audio(
                    chunk.samples.astype(np.float32) / 32768.0
                )

        await asyncio.gather(pump_video(), pump_audio())
