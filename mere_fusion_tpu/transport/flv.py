"""Pure-python FLV muxer: Screen Video v1 + PCM16LE audio.

Dependency-free single-file muxing for recording and RTMP push when
ffmpeg/PyAV are absent (the reference records H.264+AAC MP4 via PyAV,
basereal.py:77-131, and pushes RTMP through a compiled streamer,
nerfreal.py:89-124). Codecs are chosen for pure-python encodability while
staying decodable by stock players:

- video: FLV codec 3, "Screen Video" v1 (Adobe spec "Screen sharing
  codec"): the frame is split into WxH blocks, each zlib-deflated raw BGR,
  scanned bottom-up. Keyframes carry every block; interframes carry only
  blocks that changed since the previous frame (zero-length block = reuse).
- audio: FLV sound format 3 (linear PCM little-endian), 16-bit mono.

The tag/body byte layout follows the Adobe FLV/F4V spec v10.1.
"""
from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

FLV_HEADER = b"FLV\x01\x05\x00\x00\x00\x09"  # version 1, audio+video

TAG_AUDIO = 8
TAG_VIDEO = 9
TAG_SCRIPT = 18

_BLOCK = 64  # screen-video macroblock edge (16..256, multiple of 16)


# ---- AMF0 (the subset FLV metadata and RTMP commands need) -----------------

def amf0_encode(value) -> bytes:
    if value is None:
        return b"\x05"
    if isinstance(value, bool):
        return b"\x01" + (b"\x01" if value else b"\x00")
    if isinstance(value, (int, float)):
        return b"\x00" + struct.pack(">d", float(value))
    if isinstance(value, str):
        raw = value.encode()
        return b"\x02" + struct.pack(">H", len(raw)) + raw
    if isinstance(value, dict):
        out = b"\x03"
        for k, v in value.items():
            raw = k.encode()
            out += struct.pack(">H", len(raw)) + raw + amf0_encode(v)
        return out + b"\x00\x00\x09"
    if isinstance(value, (list, tuple)):  # strict array
        out = b"\x0a" + struct.pack(">I", len(value))
        for v in value:
            out += amf0_encode(v)
        return out
    raise TypeError(f"AMF0 cannot encode {type(value)!r}")


def amf0_decode(data: bytes, offset: int = 0):
    """(value, next_offset)."""
    marker = data[offset]
    offset += 1
    if marker == 0x00:
        return struct.unpack(">d", data[offset : offset + 8])[0], offset + 8
    if marker == 0x01:
        return bool(data[offset]), offset + 1
    if marker == 0x02:
        n = struct.unpack(">H", data[offset : offset + 2])[0]
        s = data[offset + 2 : offset + 2 + n].decode()
        return s, offset + 2 + n
    if marker in (0x03, 0x08):  # object / ECMA array
        if marker == 0x08:
            offset += 4  # approximate length, ignore
        obj = {}
        while True:
            n = struct.unpack(">H", data[offset : offset + 2])[0]
            offset += 2
            if n == 0 and data[offset] == 0x09:
                return obj, offset + 1
            key = data[offset : offset + n].decode()
            offset += n
            obj[key], offset = amf0_decode(data, offset)
    if marker == 0x05 or marker == 0x06:  # null / undefined
        return None, offset
    if marker == 0x0A:
        n = struct.unpack(">I", data[offset : offset + 4])[0]
        offset += 4
        arr = []
        for _ in range(n):
            v, offset = amf0_decode(data, offset)
            arr.append(v)
        return arr, offset
    raise ValueError(f"AMF0 marker {marker:#x} unsupported")


# ---- Screen Video v1 encode/decode ------------------------------------------

def encode_screen_video(frame_bgr: np.ndarray,
                        prev_bgr: Optional[np.ndarray] = None,
                        block: int = _BLOCK) -> bytes:
    """One Screen Video v1 frame body (after the FLV frame-type byte).

    prev_bgr None → keyframe (every block encoded); otherwise an interframe
    where unchanged blocks are written as zero-length (decoder reuses)."""
    h, w = frame_bgr.shape[:2]
    out = [struct.pack(">HH", ((block // 16 - 1) << 12) | w,
                       ((block // 16 - 1) << 12) | h)]
    flipped = frame_bgr[::-1]  # screen video scans bottom-up
    prev = prev_bgr[::-1] if prev_bgr is not None else None
    for by in range(0, h, block):
        for bx in range(0, w, block):
            cur = flipped[by : by + block, bx : bx + block]
            if prev is not None and np.array_equal(
                    cur, prev[by : by + block, bx : bx + block]):
                out.append(b"\x00\x00")
                continue
            raw = zlib.compress(np.ascontiguousarray(cur).tobytes(), 6)
            out.append(struct.pack(">H", len(raw)) + raw)
    return b"".join(out)


def decode_screen_video(body: bytes, prev_bgr: Optional[np.ndarray] = None
                        ) -> np.ndarray:
    """Inverse of encode_screen_video (for tests and tooling)."""
    bw_w, bh_h = struct.unpack(">HH", body[:4])
    block_w = ((bw_w >> 12) + 1) * 16
    block_h = ((bh_h >> 12) + 1) * 16
    w, h = bw_w & 0x0FFF, bh_h & 0x0FFF
    img = (prev_bgr[::-1].copy() if prev_bgr is not None
           else np.zeros((h, w, 3), np.uint8))
    offset = 4
    for by in range(0, h, block_h):
        for bx in range(0, w, block_w):
            n = struct.unpack(">H", body[offset : offset + 2])[0]
            offset += 2
            if n == 0:
                continue
            raw = zlib.decompress(body[offset : offset + n])
            offset += n
            bh = min(block_h, h - by)
            bw = min(block_w, w - bx)
            img[by : by + bh, bx : bx + bw] = np.frombuffer(
                raw, np.uint8).reshape(bh, bw, 3)
    return img[::-1]


# ---- FLV writer --------------------------------------------------------------

def flv_tag(tag_type: int, timestamp_ms: int, body: bytes) -> bytes:
    ts = int(timestamp_ms) & 0xFFFFFFFF
    head = struct.pack(">BBHB", tag_type, (len(body) >> 16) & 0xFF,
                       len(body) & 0xFFFF, (ts >> 16) & 0xFF)
    head += struct.pack(">HBBH", ts & 0xFFFF, (ts >> 24) & 0xFF,
                        0, 0)  # ts-extended, streamid(3 bytes as B+H)
    return head + body + struct.pack(">I", 11 + len(body))


class FlvPacketizer:
    """Paced frames/PCM → (tag_type, timestamp_ms, flv_body) tuples — the
    codec/timing state machine shared by FLVWriter (files) and the native
    RTMP publisher (sockets)."""

    # sound format 3 = PCM LE; rate bits: 0=5.5k 1=11k 2=22k 3=44k — FLV has
    # no 16 kHz code, players read the real rate from onMetaData (standard
    # practice for PCM in FLV); 16-bit mono
    AUDIO_HEADER = bytes([(3 << 4) | (1 << 2) | (1 << 1) | 0])

    def __init__(self, width: int, height: int, fps: int = 25,
                 sample_rate: int = 16000, gop: int = 50):
        self.width, self.height = width, height
        self.fps = fps
        self.sample_rate = sample_rate
        self.gop = gop
        self._n_video = 0
        self._audio_ms = 0.0
        self._prev = None

    def metadata(self) -> dict:
        return {
            "width": self.width, "height": self.height,
            "framerate": self.fps, "videocodecid": 3, "audiocodecid": 3,
            "audiosamplerate": self.sample_rate, "audiosamplesize": 16,
            "stereo": False, "encoder": "mere-fusion-tpu",
        }

    def video_tag(self, frame_bgr: np.ndarray) -> tuple[int, int, bytes]:
        key = self._prev is None or self._n_video % self.gop == 0
        body = encode_screen_video(frame_bgr, None if key else self._prev)
        ts = int(self._n_video * 1000 / self.fps)
        self._prev = frame_bgr.copy()
        self._n_video += 1
        return TAG_VIDEO, ts, bytes([((1 if key else 2) << 4) | 3]) + body

    def audio_tag(self, pcm_f32: np.ndarray) -> tuple[int, int, bytes]:
        pcm16 = (np.clip(pcm_f32, -1.0, 1.0) * 32767).astype("<i2")
        ts = int(self._audio_ms)
        self._audio_ms += len(pcm16) * 1000.0 / self.sample_rate
        return TAG_AUDIO, ts, self.AUDIO_HEADER + pcm16.tobytes()


class FLVWriter:
    """Mux paced video frames + PCM chunks into an .flv file (or any
    file-like). Video = Screen Video (keyframe every `gop` frames),
    audio = PCM16LE mono."""

    def __init__(self, fileobj, width: int, height: int, fps: int = 25,
                 sample_rate: int = 16000, gop: int = 50):
        self._f = fileobj
        self._pkt = FlvPacketizer(width, height, fps, sample_rate, gop)
        self._f.write(FLV_HEADER + b"\x00\x00\x00\x00")  # PreviousTagSize0
        meta = (amf0_encode("onMetaData")
                + amf0_encode(self._pkt.metadata()))
        self._f.write(flv_tag(TAG_SCRIPT, 0, meta))

    def write_video(self, frame_bgr: np.ndarray) -> None:
        tag, ts, body = self._pkt.video_tag(frame_bgr)
        self._f.write(flv_tag(tag, ts, body))

    def write_audio(self, pcm_f32: np.ndarray) -> None:
        tag, ts, body = self._pkt.audio_tag(pcm_f32)
        self._f.write(flv_tag(tag, ts, body))

    def close(self) -> None:
        self._f.flush()


def read_flv_tags(data: bytes):
    """Parse an FLV byte stream into (tag_type, timestamp_ms, body) tuples
    (tests and tooling)."""
    assert data[:3] == b"FLV", "not an FLV stream"
    offset = struct.unpack(">I", data[5:9])[0] + 4  # header + prev-size 0
    tags = []
    while offset + 11 <= len(data):
        tag_type = data[offset]
        size = struct.unpack(">I", b"\x00" + data[offset + 1 : offset + 4])[0]
        ts = struct.unpack(">I", b"\x00" + data[offset + 4 : offset + 7])[0]
        ts |= data[offset + 7] << 24
        body = data[offset + 11 : offset + 11 + size]
        tags.append((tag_type, ts, body))
        offset += 11 + size + 4
    return tags
