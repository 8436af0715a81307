import os
import time

import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.base import BaseReal
from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage


def test_recording_writes_media(tmp_path):
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
        candidates = [out, out + ".video.mp4"]
        if any(os.path.exists(p) and os.path.getsize(p) > 0 for p in candidates):
            break
        time.sleep(0.2)
    assert any(
        os.path.exists(p) and os.path.getsize(p) > 0
        for p in [out, out + ".video.mp4"]
    ), "recording must produce a video file"
    # audio: either muxed into out or kept as the split wav
    assert os.path.exists(out) or os.path.getsize(out + ".audio.wav") > 44
