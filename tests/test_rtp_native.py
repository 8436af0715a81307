"""Dependency-free RTP audio ingest: header parsing, G.711 decode golden
against audioop, and a live localhost UDP end-to-end run (no ffmpeg)."""
import socket
import struct

import numpy as np
import pytest

from mere_fusion_tpu.transport.rtp import (
    alaw_decode,
    decode_rtp_audio,
    parse_rtp_packet,
    rtp_native_audio_chunks,
    ulaw_decode,
)

audioop = pytest.importorskip("audioop")  # stdlib golden (py<=3.12)


def _packet(pt, seq, ts, payload, csrc=0, ext=b"", pad=0):
    b0 = 0x80 | (0x10 if ext else 0) | (0x20 if pad else 0) | csrc
    head = struct.pack("!BBHII", b0, pt, seq, ts, 0x1234)
    head += b"\x00" * (4 * csrc)
    if ext:
        head += struct.pack("!HH", 0xBEDE, len(ext) // 4) + ext
    tail = (b"\x00" * (pad - 1) + bytes([pad])) if pad else b""
    return head + payload + tail


def test_ulaw_alaw_match_audioop():
    all_bytes = bytes(range(256))
    np.testing.assert_array_equal(
        ulaw_decode(all_bytes),
        np.frombuffer(audioop.ulaw2lin(all_bytes, 2), np.int16))
    np.testing.assert_array_equal(
        alaw_decode(all_bytes),
        np.frombuffer(audioop.alaw2lin(all_bytes, 2), np.int16))


def test_parse_rtp_packet_variants():
    payload = b"\x11" * 20
    assert parse_rtp_packet(_packet(0, 7, 160, payload))[3] == payload
    assert parse_rtp_packet(_packet(8, 7, 160, payload, csrc=2))[3] == payload
    assert parse_rtp_packet(
        _packet(0, 7, 160, payload, ext=b"\xde\xad\xbe\xef"))[3] == payload
    assert parse_rtp_packet(_packet(0, 7, 160, payload, pad=3))[3] == payload
    assert parse_rtp_packet(b"\x00" * 11) is None          # too short
    assert parse_rtp_packet(b"\x00" * 16) is None          # wrong version
    pt, seq, ts, _ = parse_rtp_packet(_packet(11, 99, 320, payload))
    assert (pt, seq, ts) == (11, 99, 320)


def test_decode_rtp_audio_l16():
    sig = (np.sin(np.linspace(0, 9, 160)) * 20000).astype(np.int16)
    out, rate = decode_rtp_audio(11, sig.astype(">i2").tobytes())
    assert rate == 44100                                    # RFC 3551 static
    np.testing.assert_array_equal(out, sig)
    out, rate = decode_rtp_audio(96, sig.astype(">i2").tobytes(),
                                 l16_payload_type=96, l16_rate=16000)
    assert rate == 16000
    np.testing.assert_array_equal(out, sig)
    assert decode_rtp_audio(96, b"xx") is None              # unknown pt


def test_native_receiver_end_to_end_l16_and_pcmu():
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    addr = recv.getsockname()
    send = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    rng = np.random.default_rng(0)
    sig = (rng.uniform(-0.5, 0.5, 3200) * 32767).astype(np.int16)  # 0.2 s L16
    for i in range(10):
        chunk = sig[i * 320 : (i + 1) * 320]
        send.sendto(_packet(96, 100 + i, i * 320,
                            chunk.astype(">i2").tobytes()), addr)
    # a duplicate and a stale packet must be dropped
    send.sendto(_packet(96, 109, 9 * 320, b"\x7f\xff" * 320), addr)
    send.sendto(_packet(96, 50, 0, b"\x7f\xff" * 320), addr)
    # then PCMU @8 kHz (resampled 2x by the receiver)
    tone = (np.sin(np.linspace(0, 60, 800)) * 16000).astype(np.int16)
    ulaw = audioop.lin2ulaw(tone.tobytes(), 2)
    for i in range(5):
        send.sendto(_packet(0, 110 + i, 3200 + i * 160,
                            ulaw[i * 160 : (i + 1) * 160]), addr)

    chunks = list(rtp_native_audio_chunks(
        sock=recv, sample_rate=16000, chunk_seconds=0.1, timeout=1.0,
        l16_payload_type=96, l16_rate=16000))
    got = np.concatenate(chunks)
    # 0.2 s of L16 + 0.1 s of PCMU upsampled to 16 kHz = 0.3 s
    assert len(got) == 4800
    np.testing.assert_allclose(got[:3200], sig / 32768.0, atol=1e-4)
    # µ-law quantization: coarse tolerance, but clearly the same tone
    resampled = got[3200:]
    assert np.corrcoef(
        resampled[::2][:400], (tone / 32768.0)[:400])[0, 1] > 0.99
    send.close()
