"""Full-duplex integration: caller speech → streaming ASR → LLM brain →
TTS → Wav2Lip avatar frames (BASELINE.json config 5, minus live WebRTC)."""
import asyncio
import threading
from types import SimpleNamespace

import numpy as np
import pytest

from mere_fusion_tpu.asr import FakeBackend, StreamingTranscriber
from mere_fusion_tpu.brain import BrainSession
from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.avatar import synthesize_avatar
from mere_fusion_tpu.engines.lip import LipReal
from mere_fusion_tpu.llm import EchoLLM
from mere_fusion_tpu.perception import StubPerception
from mere_fusion_tpu.server.upstream import SpeechUpstream, VideoUpstream


@pytest.mark.timeout(600)
def test_full_duplex_loop(tmp_path):
    avatar = synthesize_avatar(str(tmp_path / "avatar"), n_frames=4)
    cfg = Config().override(
        **{"avatar.batch_size": 2, "tts.backend": "procedural",
           "avatar.dtype": "float32"}
    )
    engine = LipReal(cfg, avatar=avatar)
    brain = BrainSession(engine, EchoLLM("I heard {text}. "), min_phrase_len=5)

    # upstream: scripted ASR + stub perception
    script = [(0.2 + 0.3 * i, 0.45 + 0.3 * i, w)
              for i, w in enumerate(["nice", "to", "meet", "you"])]
    backend = FakeBackend(script, jitter_last=False)
    transcriber = StreamingTranscriber(backend)
    speech_up = SpeechUpstream(transcriber, brain, min_chunk_seconds=0.5)
    video_up = VideoUpstream(StubPerception(fps_throttle=1), brain)

    async def main():
        loop = asyncio.get_running_loop()
        vtrack = SimpleNamespace(_queue=asyncio.Queue())
        atrack = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render, args=(quit_event, loop, atrack, vtrack), daemon=True
        )
        t.start()

        # caller's camera frame and 2 s of mic audio arrive
        video_up.process_frame(np.full((48, 64, 3), 200, np.uint8))
        for i in range(4):
            backend.set_offset(transcriber.buffer_time_offset)
            speech_up.process_pcm(np.zeros(8000, np.float32))
        speech_up.finish()

        frames, speech_chunks = [], 0
        try:
            deadline = loop.time() + 400
            while loop.time() < deadline:
                try:
                    f = await asyncio.wait_for(vtrack._queue.get(), timeout=60)
                except asyncio.TimeoutError:
                    break
                frames.append(f)
                while not atrack._queue.empty():
                    c = atrack._queue.get_nowait()
                    if np.any(c.samples != 0):
                        speech_chunks += 1
                if speech_chunks > 0 and len(frames) >= 8:
                    break
        finally:
            quit_event.set()
            t.join(timeout=10)
            brain.close()
        return frames, speech_chunks

    frames, speech_chunks = asyncio.run(main())
    # the brain must have spoken (EchoLLM phrase reached the engine TTS)
    assert speech_chunks > 0, "LLM reply must be synthesized and streamed"
    assert len(frames) >= 8
    cycle = [f.tobytes() for f in avatar.frame_cycle]
    assert any(f.image.tobytes() not in cycle for f in frames), (
        "speech must drive generated lip frames"
    )
