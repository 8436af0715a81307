"""Pure-python FLV muxing + native RTMP publishing.

The mini RTMP server here is a real TCP peer that performs the handshake,
parses the client's chunk stream with the same reader class (proving both
directions of the chunk layer), answers connect/createStream/publish, and
collects media messages.
"""
import socket
import struct
import threading
import time

import numpy as np
import pytest

from mere_fusion_tpu.transport.flv import (
    FLVWriter,
    amf0_decode,
    amf0_encode,
    decode_screen_video,
    encode_screen_video,
    read_flv_tags,
)
from mere_fusion_tpu.transport.rtmp_native import (
    MSG_COMMAND_AMF0,
    RtmpPublisher,
    _ChunkReader,
    parse_rtmp_url,
)


def _img(seed, h=96, w=128):
    return np.random.default_rng(seed).integers(
        0, 255, (h, w, 3), dtype=np.uint8)


def test_screen_video_roundtrip_key_and_inter():
    a, b = _img(0), _img(0).copy()
    b[10:20, 10:20] = 255  # one dirty block
    key = encode_screen_video(a)
    np.testing.assert_array_equal(decode_screen_video(key), a)
    inter = encode_screen_video(b, prev_bgr=a)
    assert len(inter) < len(key), "interframe must skip unchanged blocks"
    np.testing.assert_array_equal(decode_screen_video(inter, prev_bgr=a), b)


def test_amf0_roundtrip():
    vals = ["connect", 1.0, None, True,
            {"app": "live", "n": 3.5, "nested": {"x": False}},
            ["a", 2.0, None]]
    buf = b"".join(amf0_encode(v) for v in vals)
    out, offset = [], 0
    while offset < len(buf):
        v, offset = amf0_decode(buf, offset)
        out.append(v)
    assert out == vals


def test_flv_writer_roundtrip(tmp_path):
    import io

    buf = io.BytesIO()
    w = FLVWriter(buf, 128, 96, fps=25, sample_rate=16000, gop=2)
    frames = [_img(i) for i in range(4)]
    pcm = np.linspace(-0.5, 0.5, 640, dtype=np.float32)
    for i, frame in enumerate(frames):
        w.write_video(frame)
        w.write_audio(pcm)
    w.close()

    tags = read_flv_tags(buf.getvalue())
    script = [t for t in tags if t[0] == 18]
    name, offset = amf0_decode(script[0][2], 0)
    meta, _ = amf0_decode(script[0][2], offset)
    assert name == "onMetaData" and meta["videocodecid"] == 3

    vids = [t for t in tags if t[0] == 9]
    assert len(vids) == 4
    prev = None
    for (_, ts, body), expect in zip(vids, frames):
        assert body[0] & 0x0F == 3  # screen video
        decoded = decode_screen_video(body[1:], prev_bgr=prev)
        np.testing.assert_array_equal(decoded, expect)
        prev = decoded
    auds = [t for t in tags if t[0] == 8]
    assert len(auds) == 4
    got = np.frombuffer(auds[0][2][1:], "<i2").astype(np.float32) / 32767
    np.testing.assert_allclose(got, pcm, atol=1e-4)
    # timestamps pace at the configured rates
    assert [t[1] for t in vids] == [0, 40, 80, 120]
    assert [t[1] for t in auds] == [0, 40, 80, 120]


def test_parse_rtmp_url():
    assert parse_rtmp_url("rtmp://h/live/stream") == ("h", 1935, "live", "stream")
    assert parse_rtmp_url("rtmp://h:19350/app/sub/s1") == (
        "h", 19350, "app/sub", "s1")
    with pytest.raises(Exception):
        parse_rtmp_url("http://h/live/s")


def test_extended_timestamp_roundtrip():
    """Messages past the 24-bit timestamp range survive our own chunk
    writer → reader in both single- and multi-chunk form."""
    a, b = socket.socketpair()
    pub = RtmpPublisher.__new__(RtmpPublisher)  # wire layer only
    pub._sock = a
    pub._send_lock = threading.Lock()
    reader = _ChunkReader(b)
    pub._send_message(2, 1, 0, struct.pack(">I", 4096))  # set chunk size
    big_ts = 0x1000000 + 1234  # > 16.7 M ms (~4.6 h)
    pub._send_message(4, 9, 1, b"v" * 10, timestamp=big_ts)
    pub._send_message(4, 9, 1, b"w" * 9000, timestamp=big_ts + 40)  # chunked
    t, msid, payload = reader.read_message()
    assert (t, msid, payload) == (9, 1, b"v" * 10)
    assert reader._streams[4]["ts"] == big_ts
    t, msid, payload = reader.read_message()
    assert payload == b"w" * 9000
    assert reader._streams[4]["ts"] == big_ts + 40
    a.close()
    b.close()


class MiniRtmpServer(threading.Thread):
    """Handshake + command replies + media collection."""

    def __init__(self):
        super().__init__(daemon=True)
        self.listener = socket.socket()
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(1)
        self.port = self.listener.getsockname()[1]
        self.media = []
        self.metadata = None
        self.error = None

    def _send(self, sock, csid, msg_type, msid, payload):
        header = bytes([csid & 0x3F]) + b"\x00\x00\x00" + len(
            payload).to_bytes(3, "big") + bytes([msg_type]) + msid.to_bytes(
            4, "little")
        sock.sendall(header + payload)  # replies fit one 128-byte chunk

    def run(self):
        try:
            sock, _ = self.listener.accept()
            sock.settimeout(10)
            reader = _ChunkReader(sock)
            c0c1 = reader._recv(1537)
            assert c0c1[0] == 3
            s1 = struct.pack(">II", 0, 0) + bytes(1528)
            sock.sendall(b"\x03" + s1 + c0c1[1:])  # s0 s1 s2
            reader._recv(1536)  # c2
            reader.bytes_read = 0
            while len(self.media) < 6:
                msg_type, msid, payload = reader.read_message()
                if msg_type == MSG_COMMAND_AMF0:
                    vals, offset = [], 0
                    while offset < len(payload):
                        v, offset = amf0_decode(payload, offset)
                        vals.append(v)
                    name, txn = vals[0], vals[1]
                    if name == "connect":
                        self._send(sock, 3, MSG_COMMAND_AMF0, 0,
                                   amf0_encode("_result") + amf0_encode(txn)
                                   + amf0_encode({"fmsVer": "FMS/3"})
                                   + amf0_encode({"level": "status"}))
                    elif name == "createStream":
                        self._send(sock, 3, MSG_COMMAND_AMF0, 0,
                                   amf0_encode("_result") + amf0_encode(txn)
                                   + amf0_encode(None) + amf0_encode(1.0))
                    elif name == "publish":
                        self._send(sock, 3, MSG_COMMAND_AMF0, 1,
                                   amf0_encode("onStatus") + amf0_encode(0.0)
                                   + amf0_encode(None) + amf0_encode(
                                       {"code": "NetStream.Publish.Start"}))
                elif msg_type == 18:
                    _, off = amf0_decode(payload, 0)      # @setDataFrame
                    _, off = amf0_decode(payload, off)    # onMetaData
                    self.metadata, _ = amf0_decode(payload, off)
                elif msg_type in (8, 9):
                    self.media.append((msg_type, payload))
            sock.close()
        except Exception as e:  # surface in the main thread
            self.error = e


def test_publisher_against_mini_server():
    server = MiniRtmpServer()
    server.start()
    pub = RtmpPublisher(f"rtmp://127.0.0.1:{server.port}/live/cam")
    frame = _img(7)
    body = bytes([(1 << 4) | 3]) + encode_screen_video(frame)
    pub.send_metadata({"width": 128.0, "height": 96.0})
    for i in range(3):
        pub.send_video(body, i * 40)
        pub.send_audio(b"\x36" + b"\x00\x01" * 320, i * 40)
    server.join(timeout=15)
    assert server.error is None, server.error
    assert server.metadata["width"] == 128.0
    vids = [p for t, p in server.media if t == 9]
    auds = [p for t, p in server.media if t == 8]
    assert len(vids) == 3 and len(auds) == 3
    np.testing.assert_array_equal(decode_screen_video(vids[0][1:]), frame)
    pub.close()


def test_rtmp_streamer_native_fallback_end_to_end():
    from mere_fusion_tpu.transport.rtmp import RtmpStreamer

    server = MiniRtmpServer()
    server.start()
    streamer = RtmpStreamer(f"rtmp://127.0.0.1:{server.port}/live/x",
                            width=128, height=96, force_native=True)
    frame = _img(9)
    for i in range(3):
        streamer.stream_frame(frame)
        streamer.stream_frame_audio(np.zeros(320, np.float32))
    server.join(timeout=15)
    assert server.error is None, server.error
    assert server.metadata["videocodecid"] == 3
    vids = [p for t, p in server.media if t == 9]
    assert len(vids) == 3
    assert vids[0][0] >> 4 == 1                      # keyframe
    assert vids[1][0] >> 4 == 2                      # delta frame
    np.testing.assert_array_equal(decode_screen_video(vids[0][1:]), frame)
    streamer.close()


def test_engine_flv_recording(tmp_path):
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.engines.base import BaseReal
    from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage

    cfg = Config().override(**{"tts.backend": "procedural"})
    engine = BaseReal(cfg)
    path = str(tmp_path / "rec.flv")
    engine.start_recording(path)
    frame = _img(11, h=64, w=64)
    for _ in range(3):
        engine.record_video_frame(VideoImage(image=frame))
        for _ in range(2):
            engine.record_audio_chunk(
                AudioChunk(samples=np.zeros(320, np.int16)))
    time.sleep(1.0)  # the record thread drains at its own pace
    engine.stop_recording()
    time.sleep(1.5)
    with open(path, "rb") as f:
        tags = read_flv_tags(f.read())
    vids = [t for t in tags if t[0] == 9]
    auds = [t for t in tags if t[0] == 8]
    assert len(vids) == 3 and len(auds) == 6
    np.testing.assert_array_equal(decode_screen_video(vids[0][2][1:]), frame)
