"""Dependency-free RTP *output*: paced avatar audio+video over plain UDP.

The reference exposes rtmp/rtcpush output transports and RTP ingest but has
no ffmpeg-free RTP sender (reference: app.py:699 transport flag,
whisper_online_server.py:194-206 ingest contract). This module completes the
no-external-deps live-media story:

- audio: L16 mono big-endian PCM (RFC 3551 §4.5.11) at the engine's 16 kHz,
  dynamic payload type 96 — decodable by our own
  transport.rtp.rtp_native_audio_chunks(l16_payload_type=96, l16_rate=16000);
- video: uncompressed RGB 8-bit per RFC 4175 (scan-line payload with
  extended sequence number + per-segment line headers), dynamic payload
  type 97, 90 kHz clock, marker bit on the last packet of a frame;
- RTCP sender reports (RFC 3550 §6.4.1) every ~2 s on port+1 so receivers
  can map RTP timestamps to NTP wall clock.

Everything is stdlib + numpy; the loopback e2e test sends a live session
through a real UDP socket pair and reassembles 25 fps video + 50 Hz audio.
"""
from __future__ import annotations

import secrets
import socket
import struct
import time
from typing import Iterator, Optional

import numpy as np

from mere_fusion_tpu.transport.rtp import parse_rtp_packet

L16_PAYLOAD_TYPE = 96
RAW_VIDEO_PAYLOAD_TYPE = 97
_MTU_PAYLOAD = 1380          # RTP payload budget under a 1500 MTU
_NTP_EPOCH_OFFSET = 2208988800  # 1900 → 1970


def _rtp_header(pt: int, seq: int, ts: int, ssrc: int, marker: bool) -> bytes:
    return struct.pack(
        "!BBHII", 0x80, (pt & 0x7F) | (0x80 if marker else 0),
        seq & 0xFFFF, ts & 0xFFFFFFFF, ssrc,
    )


class _RtpStream:
    """Sequence/SSRC bookkeeping + RTCP SR emission for one media stream."""

    def __init__(self, sock: socket.socket, addr, pt: int,
                 clock_rate: int, rtcp_addr=None):
        self.sock = sock
        self.addr = addr
        self.pt = pt
        self.clock_rate = clock_rate
        self.ssrc = secrets.randbits(32)
        # 32-bit packet counter: the RTP header carries the low 16 bits,
        # RFC 4175 payloads prepend the high 16 as the extended sequence
        # number (it is a per-stream counter, NOT per-frame — at 512² RGB /
        # 25 fps the 16-bit base wraps every ~5 s)
        self.seq = secrets.randbits(16)
        self.packets = 0
        self.octets = 0
        self.rtcp_addr = rtcp_addr
        self._last_sr = 0.0

    @property
    def ext_seq(self) -> int:
        """High 16 bits of the NEXT packet's 32-bit sequence number."""
        return (self.seq >> 16) & 0xFFFF

    def send(self, payload: bytes, ts: int, marker: bool) -> None:
        hdr = _rtp_header(self.pt, self.seq, ts, self.ssrc, marker)
        self.sock.sendto(hdr + payload, self.addr)
        self.seq = (self.seq + 1) & 0xFFFFFFFF
        self.packets += 1
        self.octets += len(payload)

    def maybe_send_sr(self, ts: int, interval: float = 2.0) -> None:
        if self.rtcp_addr is None:
            return
        now = time.time()
        if now - self._last_sr < interval:
            return
        self._last_sr = now
        ntp = now + _NTP_EPOCH_OFFSET
        ntp_sec = int(ntp)
        ntp_frac = int((ntp - ntp_sec) * (1 << 32)) & 0xFFFFFFFF
        # SR: V=2, P=0, RC=0, PT=200, length=6 32-bit words minus one
        pkt = struct.pack(
            "!BBHIIIIII", 0x80, 200, 6, self.ssrc,
            ntp_sec & 0xFFFFFFFF, ntp_frac, ts & 0xFFFFFFFF,
            self.packets & 0xFFFFFFFF, self.octets & 0xFFFFFFFF,
        )
        self.sock.sendto(pkt, self.rtcp_addr)


class RtpSender:
    """Send paced engine frames as RTP/UDP (audio L16 + video RFC 4175)."""

    def __init__(self, host: str = "127.0.0.1", audio_port: int = 5004,
                 video_port: int = 5006, rtcp: bool = True):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.audio = _RtpStream(
            self.sock, (host, audio_port), L16_PAYLOAD_TYPE, 16000,
            rtcp_addr=(host, audio_port + 1) if rtcp else None,
        )
        self.video = _RtpStream(
            self.sock, (host, video_port), RAW_VIDEO_PAYLOAD_TYPE, 90000,
            rtcp_addr=(host, video_port + 1) if rtcp else None,
        )

    # ---- audio: L16 (network byte order) per RFC 3551 §4.5.11 ----------------
    def send_audio(self, samples: np.ndarray, ts: int) -> None:
        """samples: int16 mono (one 20 ms chunk); ts in samples @16 kHz."""
        payload = samples.astype(">i2").tobytes()
        self.audio.send(payload, ts, marker=False)
        self.audio.maybe_send_sr(ts)

    # ---- video: RFC 4175 uncompressed RGB --------------------------------------
    def send_video(self, image_bgr: np.ndarray, ts: int) -> None:
        """image_bgr: [H, W, 3] uint8 (engine convention); sent as RGB
        scan-line segments, marker on the frame's final packet."""
        rgb = np.ascontiguousarray(image_bgr[..., ::-1])
        h, w = rgb.shape[:2]
        row_bytes = rgb.reshape(h, w * 3)
        line = 0
        offset_px = 0  # pixel offset within the current line
        while line < h:
            segments = []   # (line_no, offset_px, length_bytes)
            room = _MTU_PAYLOAD - 2   # extended seq word
            # greedily pack line segments: 6-byte header + data each
            probe_line, probe_off = line, offset_px
            while probe_line < h and room >= 6 + 3:
                avail_px = w - probe_off
                take_px = min(avail_px, (room - 6) // 3)
                if take_px <= 0:
                    break
                segments.append((probe_line, probe_off, take_px * 3))
                room -= 6 + take_px * 3
                probe_off += take_px
                if probe_off >= w:
                    probe_line += 1
                    probe_off = 0
            payload = bytearray(struct.pack("!H", self.video.ext_seq))
            for i, (ln, off, nbytes) in enumerate(segments):
                cont = 0x8000 if i + 1 < len(segments) else 0
                payload += struct.pack(
                    "!HHH", nbytes, ln & 0x7FFF, cont | (off & 0x7FFF)
                )
            for (ln, off, nbytes) in segments:
                payload += row_bytes[ln, off * 3 : off * 3 + nbytes].tobytes()
            line, offset_px = probe_line, probe_off
            self.video.send(bytes(payload), ts, marker=line >= h)
        self.video.maybe_send_sr(ts)

    def close(self) -> None:
        self.sock.close()


class RtpTrackSink:
    """Drain HumanPlayer-style paced tracks into an RtpSender (the rtp
    analog of transport.rtmp.RtmpTrackSink)."""

    def __init__(self, sender: RtpSender):
        self.sender = sender
        self._audio_ts = 0
        self._video_ts = 0

    async def run(self, video_track, audio_track, quit_event) -> None:
        import asyncio

        async def pump_video():
            while not quit_event.is_set():
                frame = await video_track.recv()
                ts = frame.pts if frame.pts is not None else self._video_ts
                self.sender.send_video(frame.image, ts)
                self._video_ts = ts + 90000 // 25

        async def pump_audio():
            while not quit_event.is_set():
                chunk = await audio_track.recv()
                ts = chunk.pts if chunk.pts is not None else self._audio_ts
                self.sender.send_audio(chunk.samples, ts)
                self._audio_ts = ts + chunk.samples.shape[0]

        await asyncio.gather(pump_video(), pump_audio())


# ---- receive side (tests + native video ingest) --------------------------------

def parse_rfc4175_packet(payload: bytes):
    """RFC 4175 payload → [(line_no, pixel_offset, data_bytes)]."""
    if len(payload) < 2:
        return []
    segments = []
    pos = 2  # skip extended sequence number
    headers = []
    while pos + 6 <= len(payload):
        nbytes, ln, off = struct.unpack("!HHH", payload[pos : pos + 6])
        pos += 6
        headers.append((nbytes, ln & 0x7FFF, off & 0x7FFF))
        if not off & 0x8000:
            break
    for (nbytes, ln, off) in headers:
        segments.append((ln, off, payload[pos : pos + nbytes]))
        pos += nbytes
    return segments


def rtp_native_video_frames(
    bind=("0.0.0.0", 5006), width: int = 512, height: int = 512,
    payload_type: int = RAW_VIDEO_PAYLOAD_TYPE,
    sock: Optional[socket.socket] = None,
    timeout: Optional[float] = 30.0,
) -> Iterator[np.ndarray]:
    """Reassemble RFC 4175 RGB frames from UDP → BGR uint8 [H, W, 3].

    Frames are keyed by RTP timestamp and yielded on the marker bit; packets
    of a stale timestamp (late reorder across a frame boundary) are dropped."""
    own = sock is None
    if own:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind(bind)
    if timeout is not None:
        sock.settimeout(timeout)
    cur_ts = None
    yielded = False
    frame = np.zeros((height, width * 3), np.uint8)
    try:
        while True:
            try:
                data, _addr = sock.recvfrom(65536)
            except socket.timeout:
                break
            parsed = parse_rtp_packet(data)
            if parsed is None:
                continue
            pt, _seq, ts, payload = parsed
            if pt != payload_type:
                continue
            if ts != cur_ts:
                newer = cur_ts is None or ((ts - cur_ts) & 0xFFFFFFFF) < 0x80000000
                if not newer:
                    continue  # late packet of an already-finished frame
                cur_ts = ts
                yielded = False
                frame[:] = 0
            elif yielded:
                continue  # duplicate tail of an already-yielded frame
            for (ln, off_px, seg) in parse_rfc4175_packet(payload):
                if ln >= height:
                    continue
                start = off_px * 3
                end = min(start + len(seg), width * 3)
                frame[ln, start:end] = np.frombuffer(
                    seg[: end - start], np.uint8
                )
            if data[1] & 0x80:  # marker: frame complete
                rgb = frame.reshape(height, width, 3)
                yield np.ascontiguousarray(rgb[..., ::-1])
                yielded = True
    finally:
        if own:
            sock.close()
