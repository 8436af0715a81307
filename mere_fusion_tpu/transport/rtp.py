"""RTP/RTSP media ingest.

Behavioral twin of the reference's RTP paths
(reference: whisper_online_server.py:194-206 for audio,
yolo_opencv.py:45-52 for video): ffmpeg pulls the RTP/RTMP/RTSP stream and
writes raw PCM16 or raw BGR frames to stdout, which we chunk and hand to the
upstream processors.

Two audio ingest paths:
- ``rtp_audio_chunks`` — the ffmpeg pipe (any codec ffmpeg can demux;
  requires the binary);
- ``rtp_native_audio_chunks`` — a dependency-free UDP receiver with its own
  RTP depacketizer and G.711 µ-law/A-law/L16 decoders, covering the plain
  telephony payloads the reference's whisper RTP server actually ingests.
"""
from __future__ import annotations

import socket
import struct
import subprocess
from typing import Iterator, Optional

import numpy as np


def rtp_audio_chunks(url: str, sample_rate: int = 16000,
                     chunk_seconds: float = 1.0,
                     sdp_file: str | None = None) -> Iterator[np.ndarray]:
    """Yield float32 PCM chunks from an RTP/RTSP/RTMP source."""
    src = ["-protocol_whitelist", "file,udp,rtp", "-i", sdp_file] if sdp_file else ["-i", url]
    cmd = [
        "ffmpeg", "-loglevel", "error", *src,
        "-vn", "-acodec", "pcm_s16le", "-ac", "1", "-ar", str(sample_rate),
        "-f", "s16le", "pipe:1",
    ]
    n_bytes = int(chunk_seconds * sample_rate) * 2
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
    try:
        while True:
            data = proc.stdout.read(n_bytes)
            if not data:
                break
            pcm = np.frombuffer(data, np.int16).astype(np.float32) / 32768.0
            yield pcm
    finally:
        proc.kill()


# ---- dependency-free RTP audio (RFC 3550 header + G.711/L16 payloads) ------

def parse_rtp_packet(data: bytes):
    """(payload_type, sequence, timestamp, payload) or None for non-RTP.

    Handles CSRC lists, header extensions, and padding (RFC 3550 §5.1)."""
    if len(data) < 12:
        return None
    b0, b1, seq, ts, _ssrc = struct.unpack("!BBHII", data[:12])
    if (b0 >> 6) != 2:  # version
        return None
    offset = 12 + 4 * (b0 & 0x0F)           # CSRC count
    if b0 & 0x10:                           # extension
        if len(data) < offset + 4:
            return None
        ext_len = struct.unpack("!H", data[offset + 2 : offset + 4])[0]
        offset += 4 + 4 * ext_len
    end = len(data)
    if b0 & 0x20 and end > offset:          # padding: last byte = pad count
        end -= data[-1]
    if end < offset:
        return None
    return b1 & 0x7F, seq, ts, data[offset:end]


def ulaw_decode(payload: bytes) -> np.ndarray:
    """G.711 µ-law → int16 (ITU-T G.711; matches audioop.ulaw2lin)."""
    u = ~np.frombuffer(payload, np.uint8) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant.astype(np.int32) << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_decode(payload: bytes) -> np.ndarray:
    """G.711 A-law → int16 (ITU-T G.711; matches audioop.alaw2lin)."""
    a = np.frombuffer(payload, np.uint8) ^ 0x55
    exp = (a >> 4) & 0x07
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(exp > 0, ((mant << 4) + 0x108) << (exp - 1),
                   (mant << 4) + 8)
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


_G711_RATE = 8000
_DECODERS = {0: ulaw_decode, 8: alaw_decode}


def decode_rtp_audio(pt: int, payload: bytes,
                     l16_payload_type: Optional[int] = None,
                     l16_rate: int = 16000
                     ) -> Optional[tuple[np.ndarray, int]]:
    """(int16 samples, sample_rate) for supported payload types:
    0 = PCMU, 8 = PCMA (both 8 kHz), 11 = L16 mono @44.1 kHz (RFC 3551),
    `l16_payload_type` = dynamically-negotiated L16 mono at ``l16_rate``."""
    if pt in _DECODERS:
        return _DECODERS[pt](payload), _G711_RATE
    if pt == 11:
        n = len(payload) // 2 * 2
        return np.frombuffer(payload[:n], ">i2").astype(np.int16), 44100
    if l16_payload_type is not None and pt == l16_payload_type:
        n = len(payload) // 2 * 2
        return np.frombuffer(payload[:n], ">i2").astype(np.int16), l16_rate
    return None


def rtp_native_audio_chunks(bind=("0.0.0.0", 5004), sample_rate: int = 16000,
                            chunk_seconds: float = 1.0,
                            l16_payload_type: Optional[int] = None,
                            l16_rate: int = 16000,
                            sock: Optional[socket.socket] = None,
                            timeout: Optional[float] = 30.0,
                            ) -> Iterator[np.ndarray]:
    """Yield float32 PCM chunks at ``sample_rate`` from a live RTP/UDP feed —
    no ffmpeg. Packets are decoded in arrival order; duplicates and
    stale-by-sequence packets are dropped (a jitter buffer is overkill for
    the reference's LAN ingest, whisper_online_server.py:194-206)."""
    from mere_fusion_tpu.tts import resample_pcm

    own = sock is None
    if own:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind(bind)
    if timeout is not None:
        sock.settimeout(timeout)
    target = int(chunk_seconds * sample_rate)
    buf: list[np.ndarray] = []
    buffered = 0
    last_seq = None
    try:
        while True:
            try:
                data, _addr = sock.recvfrom(65536)
            except socket.timeout:
                break
            if not data:
                # zero-length datagrams are NAT keepalives, not end-of-stream
                # (UDP has no connection-closed signal)
                continue
            parsed = parse_rtp_packet(data)
            if parsed is None:
                continue
            pt, seq, _ts, payload = parsed
            if last_seq is not None:
                ahead = (seq - last_seq) & 0xFFFF
                if ahead == 0 or ahead > 0x8000:  # duplicate / late
                    continue
            last_seq = seq
            decoded = decode_rtp_audio(pt, payload, l16_payload_type,
                                       l16_rate)
            if decoded is None:
                continue
            samples, rate = decoded
            pcm = samples.astype(np.float32) / 32768.0
            if rate != sample_rate:
                pcm = resample_pcm(pcm, rate, sample_rate)
            buf.append(pcm)
            buffered += len(pcm)
            if buffered >= target:
                out = np.concatenate(buf)
                buf, buffered = [out[target:]], len(out) - target
                yield out[:target]
    finally:
        if own:
            sock.close()
    if buffered:
        yield np.concatenate(buf)


def rtp_video_frames(url: str, width: int, height: int) -> Iterator[np.ndarray]:
    """Yield BGR uint8 frames from an RTP/RTSP/RTMP source."""
    cmd = [
        "ffmpeg", "-loglevel", "error", "-i", url,
        "-an", "-f", "rawvideo", "-pix_fmt", "bgr24",
        "-s", f"{width}x{height}", "pipe:1",
    ]
    n_bytes = width * height * 3
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
    try:
        while True:
            data = proc.stdout.read(n_bytes)
            if len(data) < n_bytes:
                break
            yield np.frombuffer(data, np.uint8).reshape(height, width, 3)
    finally:
        proc.kill()
