import io
import os
import struct
import time

import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.base import BaseReal
from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage
from mere_fusion_tpu.transport.mp4 import MP4Writer, parse_boxes


def _children(data, start, end):
    return {t: (s, e) for t, s, e in parse_boxes(data, start, end)}


def _walk(data, span, *path):
    for typ in path:
        kids = _children(data, *span)
        assert typ in kids, f"missing box {typ!r}; have {list(kids)}"
        span = kids[typ]
    return span


def test_recording_writes_single_mp4(tmp_path):
    cfg = Config().override(**{"tts.backend": "procedural"})
    engine = BaseReal(cfg)
    out = str(tmp_path / "session.mp4")
    engine.start_recording(out)
    img = np.full((64, 64, 3), 99, np.uint8)
    for _ in range(10):
        engine.record_video_frame(VideoImage(image=img))
        for _ in range(2):
            engine.record_audio_chunk(
                AudioChunk(samples=np.ones(320, np.int16) * 1000)
            )
    time.sleep(1.0)
    engine.stop_recording()
    for _ in range(50):  # wait for the writer thread to flush
        if os.path.exists(out) and os.path.getsize(out) > 0:
            try:
                data = open(out, "rb").read()
                if any(t == b"moov" for t, _, _ in parse_boxes(data)):
                    break
            except ValueError:
                pass
        time.sleep(0.2)
    data = open(out, "rb").read()
    top = [t for t, _, _ in parse_boxes(data)]
    assert top == [b"ftyp", b"free", b"mdat", b"moov"], top


def test_mp4_box_layout_and_samples():
    """Mux a known stream in-memory and verify the full ISO-BMFF layout:
    ftyp/mdat/moov tree, both sample tables, and that the first video
    sample decodes back to the input frame (reference single-file
    recording contract: basereal.py:77-131)."""
    import cv2

    f = io.BytesIO()
    w = MP4Writer(f, 32, 24, fps=25.0, sample_rate=16000)
    img = np.zeros((24, 32, 3), np.uint8)
    img[:, :16] = (255, 0, 0)
    n_frames, n_chunks = 7, 14
    for i in range(n_frames):
        w.write_video(img)
        w.write_audio(np.full(320, 100 * i, np.int16))
        w.write_audio((np.ones(320, np.float32) * 0.25))
    w.close()
    data = f.getvalue()

    kids = _children(data, 0, len(data))
    assert set(kids) == {b"ftyp", b"free", b"mdat", b"moov"}
    moov = kids[b"moov"]
    traks = [(s, e) for t, s, e in parse_boxes(data, *moov) if t == b"trak"]
    assert len(traks) == 2

    # --- video track ---
    stbl = _walk(data, traks[0], b"mdia", b"minf", b"stbl")
    tables = _children(data, *stbl)
    s, e = tables[b"stsd"]
    assert data[s + 8 + 4:s + 8 + 8] == b"mp4v"
    # esds inside the visual sample entry declares OTI 0x6C (JPEG)
    assert b"esds" in data[s:e] and b"\x6c" in data[s:e]
    s, e = tables[b"stsz"]
    _, _, count = struct.unpack(">III", data[s:s + 12])
    assert count == n_frames
    sizes = struct.unpack(f">{count}I", data[s + 12:s + 12 + 4 * count])
    s, e = tables[b"stco"]
    (n_off,) = struct.unpack(">I", data[s + 4:s + 8])
    offsets = struct.unpack(f">{n_off}I", data[s + 8:s + 8 + 4 * n_off])
    assert n_off == n_frames
    # first video sample is a decodable JPEG of the input frame
    jpeg = data[offsets[0]:offsets[0] + sizes[0]]
    assert jpeg[:2] == b"\xff\xd8" and jpeg[-2:] == b"\xff\xd9"
    dec = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    assert dec.shape == (24, 32, 3)
    assert abs(int(dec[5, 5, 0]) - 255) < 30 and int(dec[5, 28, 0]) < 30
    # stts: all frames at 90000/25
    s, e = tables[b"stts"]
    assert struct.unpack(">III", data[s + 4:s + 16]) == (1, n_frames, 3600)

    # --- audio track ---
    stbl = _walk(data, traks[1], b"mdia", b"minf", b"stbl")
    tables = _children(data, *stbl)
    s, e = tables[b"stsd"]
    assert data[s + 8 + 4:s + 8 + 8] == b"sowt"
    s, e = tables[b"stsz"]
    sample_size, count = struct.unpack(">II", data[s + 4:s + 12])
    assert (sample_size, count) == (2, n_chunks * 320)
    s, e = tables[b"stco"]
    (n_off,) = struct.unpack(">I", data[s + 4:s + 8])
    offsets_a = struct.unpack(f">{n_off}I", data[s + 8:s + 8 + 4 * n_off])
    assert n_off == n_chunks
    # PCM round-trips: chunk 2 was written as frame i=1 -> constant 100
    pcm = np.frombuffer(data[offsets_a[2]:offsets_a[2] + 640], "<i2")
    assert (pcm == 100).all()
    # float chunk scaled to int16: 0.25 -> 8192
    pcm = np.frombuffer(data[offsets_a[1]:offsets_a[1] + 640], "<i2")
    assert (pcm == 8192).all()


def test_mp4_audio_reblocking_and_tail_pad():
    """Odd-sized audio writes re-block to 320-sample chunks; a short tail
    is zero-padded on close so stsc stays a single fixed entry."""
    f = io.BytesIO()
    w = MP4Writer(f, 16, 16)
    w.write_video(np.zeros((16, 16, 3), np.uint8))
    w.write_audio(np.arange(500, dtype=np.int16))     # 1 chunk + 180 rem
    w.write_audio(np.arange(100, dtype=np.int16))     # rem 280
    w.close()                                          # padded final chunk
    data = f.getvalue()
    moov = _children(data, 0, len(data))[b"moov"]
    traks = [(s, e) for t, s, e in parse_boxes(data, *moov) if t == b"trak"]
    stbl = _walk(data, traks[1], b"mdia", b"minf", b"stbl")
    tables = _children(data, *stbl)
    s, _ = tables[b"stsz"]
    sample_size, count = struct.unpack(">II", data[s + 4:s + 12])
    assert (sample_size, count) == (2, 640)           # 2 chunks total
    s, _ = tables[b"stco"]
    (n_off,) = struct.unpack(">I", data[s + 4:s + 8])
    assert n_off == 2
    off = struct.unpack(">2I", data[s + 8:s + 16])
    tail = np.frombuffer(data[off[1]:off[1] + 640], "<i2")
    # 180 leftover from write 1, then 100 from write 2, then zeros
    assert (tail[:180] == np.arange(320, 500)).all()
    assert (tail[180:280] == np.arange(100)).all()
    assert (tail[280:] == 0).all()


def test_mp4_4gib_recording_uses_largesize_and_co64(tmp_path):
    """Recordings past 4 GiB must stay playable: close() rewrites the
    reserved `free` box as a 64-bit (size=1 + largesize) mdat header and
    the chunk-offset tables switch stco → co64 (ISO 14496-12 §4.2, §8.7.5).
    The file is written sparse so the test costs no real disk."""
    import cv2

    p = tmp_path / "big.mp4"
    with open(p, "w+b") as f:
        w = MP4Writer(f, 16, 16, fps=25.0, sample_rate=16000)
        w.write_video(np.zeros((16, 16, 3), np.uint8))
        w.write_audio(np.zeros(320, np.int16))
        # simulate hours of recording: jump the write head past 4 GiB
        f.seek((1 << 32) + 64)
        w.write_video(np.full((16, 16, 3), 255, np.uint8))
        w.write_audio(np.full(320, 1234, np.int16))
        w.close()
        end = f.tell()

    with open(p, "rb") as f:
        head = f.read(64)
        # ftyp, then the rewritten 16-byte largesize mdat header
        ftyp_size = struct.unpack(">I", head[:4])[0]
        assert head[ftyp_size + 4:ftyp_size + 8] == b"mdat"
        assert struct.unpack(">I", head[ftyp_size:ftyp_size + 4])[0] == 1
        (largesize,) = struct.unpack(
            ">Q", head[ftyp_size + 8:ftyp_size + 16])
        f.seek(0, os.SEEK_END)
        file_end = f.tell()
        moov_size = file_end - (ftyp_size + largesize)
        assert moov_size > 0
        f.seek(ftyp_size + largesize)
        moov = f.read(moov_size)
    assert moov[4:8] == b"moov"
    assert b"co64" in moov and b"stco" not in moov
    # co64 offsets point at the real samples: decode the second video frame
    i = moov.find(b"co64")
    (n_off,) = struct.unpack(">I", moov[i + 8:i + 12])
    assert n_off == 2
    offs = struct.unpack(">2Q", moov[i + 12:i + 28])
    assert offs[1] > (1 << 32)
    sizes_i = moov.find(b"stsz")
    _, count = struct.unpack(">II", moov[sizes_i + 8:sizes_i + 16])
    assert count == 2
    size2 = struct.unpack(">I", moov[sizes_i + 20:sizes_i + 24])[0]
    with open(p, "rb") as f:
        f.seek(offs[1])
        jpg = np.frombuffer(f.read(size2), np.uint8)
    img = cv2.imdecode(jpg, cv2.IMREAD_COLOR)
    assert img.shape == (16, 16, 3) and img.mean() > 250
