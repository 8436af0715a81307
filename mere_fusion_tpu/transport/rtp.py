"""RTP/RTSP media ingest through an ffmpeg subprocess pipe.

Behavioral twin of the reference's RTP paths
(reference: whisper_online_server.py:194-206 for audio,
yolo_opencv.py:45-52 for video): ffmpeg pulls the RTP/RTMP/RTSP stream and
writes raw PCM16 or raw BGR frames to stdout, which we chunk and hand to the
upstream processors. Requires the ffmpeg binary.
"""
from __future__ import annotations

import subprocess
from typing import Iterator

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
