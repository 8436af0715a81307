"""End-to-end engine test: TTS → ASR → device step → assembly → tracks,
with no pretrained weights (mirrors the reference's silence short-circuit
that lets the media pipeline run without a model, lipreal.py:102-105)."""
import asyncio
import threading
from types import SimpleNamespace

import numpy as np
import pytest

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.lip import LipReal, mel_window_starts
from mere_fusion_tpu.engines.avatar import synthesize_avatar


@pytest.fixture(scope="module")
def avatar(tmp_path_factory):
    return synthesize_avatar(str(tmp_path_factory.mktemp("avatar")), n_frames=6)


@pytest.fixture(scope="module")
def engine(avatar):
    cfg = Config().override(
        **{"avatar.batch_size": 2, "tts.backend": "procedural", "avatar.dtype": "float32"}
    )
    return LipReal(cfg, avatar=avatar)


def _run_session(engine, n_video: int, say: str | None = None, timeout=120.0):
    async def main():
        loop = asyncio.get_running_loop()
        video_track = SimpleNamespace(_queue=asyncio.Queue())
        audio_track = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render,
            args=(quit_event, loop, audio_track, video_track),
            daemon=True,
        )
        t.start()
        if say:
            engine.put_msg_txt(say)
        frames, chunks = [], []
        try:
            while len(frames) < n_video:
                frames.append(
                    await asyncio.wait_for(video_track._queue.get(), timeout=timeout)
                )
            while len(chunks) < 2 * n_video:
                chunks.append(
                    await asyncio.wait_for(audio_track._queue.get(), timeout=timeout)
                )
        finally:
            quit_event.set()
            t.join(timeout=10)
        return frames, chunks

    return asyncio.run(main())


def test_mel_window_starts_match_reference_formula():
    # 16-frame batch, strides 10/10, fps 25 → starts 16 + 6.4*i clamped to T-16
    starts = mel_window_starts(52, 320, 16, 25, 10)
    assert starts[:5] == [16, 22, 28, 35, 41]
    assert max(starts) <= 84 - 16
    assert starts[-1] == 68  # clamped tail


def test_silence_path_emits_idle_frames(engine, avatar):
    frames, chunks = _run_session(engine, n_video=8)
    cycle = [f.tobytes() for f in avatar.frame_cycle]
    for vf in frames:
        assert vf.image.tobytes() in cycle, "silence frame must be an untouched idle frame"
    for ch in chunks:
        assert ch.samples.dtype == np.int16
        assert np.all(ch.samples == 0), "silence audio must be zeros"


def test_speech_path_mutates_face_region(engine, avatar):
    frames, chunks = _run_session(engine, n_video=24, say="hello from the tpu pipeline")
    assert any(np.any(c.samples != 0) for c in chunks), "speech audio must flow"
    cycle = [f.tobytes() for f in avatar.frame_cycle]
    changed = [vf for vf in frames if vf.image.tobytes() not in cycle]
    assert changed, "speech must produce generated (pasted) frames"
    # paste must stay inside the bbox: border rows untouched
    vf = changed[0]
    assert any(
        np.array_equal(vf.image[0], f[0]) and np.array_equal(vf.image[-1], f[-1])
        for f in avatar.frame_cycle
    )


def test_pause_talk_clears_queue(engine):
    engine.put_msg_txt("some long text " * 20)
    engine.pause_talk()
    assert engine.asr.queue.qsize() == 0


def test_stale_silence_flagging():
    """Entries consumed before speech arrival are stale (droppable); the
    speech entry itself and anything after it are not."""
    from mere_fusion_tpu.engines.base_asr import BaseASR

    asr = BaseASR(Config())
    pre = []
    for _ in range(5):  # pipeline pre-fills with silence
        frame, ftype = asr.get_audio_frame()
        pre.append((frame, ftype, asr.consumed_seq))
    assert all(f[1] == 1 for f in pre)
    asr.put_audio_frame(np.ones(asr.chunk, np.float32))
    assert asr.is_stale_silence(pre)
    speech = []
    for _ in range(2):  # speech chunk + trailing fresh silence
        frame, ftype = asr.get_audio_frame()
        speech.append((frame, ftype, asr.consumed_seq))
    assert speech[0][1] == 0
    assert not asr.is_stale_silence(speech)
    assert not asr.is_stale_silence([speech[1]])  # fresh silence: play it


def test_first_speech_frame_skips_buffered_silence(avatar):
    """Audio-to-first-frame: pre-buffered idle frames queued ahead of the
    first utterance are dropped, so the first generated frame arrives within
    a small number of emitted frames instead of the full pipeline depth
    (2 feature batches + res queue + track ≈ 5·batch frames)."""
    cfg = Config().override(
        **{"avatar.batch_size": 8, "tts.backend": "procedural",
           "avatar.dtype": "float32"}
    )
    engine = LipReal(cfg, avatar=avatar)
    cycle = [f.tobytes() for f in avatar.frame_cycle]

    async def main():
        loop = asyncio.get_running_loop()
        video_track = SimpleNamespace(_queue=asyncio.Queue())
        audio_track = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render,
            args=(quit_event, loop, audio_track, video_track),
            daemon=True,
        )
        t.start()
        try:
            # let the pipeline fill with buffered silence (several batches)
            for _ in range(3 * cfg.avatar.batch_size):
                await asyncio.wait_for(video_track._queue.get(), timeout=120)
            engine.put_msg_txt("hello hello hello hello")
            emitted_after_put = 0
            while True:
                vf = await asyncio.wait_for(video_track._queue.get(), timeout=120)
                if vf.image.tobytes() not in cycle:
                    return emitted_after_put
                emitted_after_put += 1
        finally:
            quit_event.set()
            t.join(timeout=10)

    silence_before_speech = asyncio.run(main())
    # without stale-silence dropping this is ~5·batch (≈40); with it, only
    # frames already past the res queue at put time can precede speech
    assert silence_before_speech <= 2 * cfg.avatar.batch_size, (
        f"{silence_before_speech} buffered silence frames preceded speech"
    )


def test_speech_start_ts_arms_only_on_silence_transition():
    """The audio-to-first-frame clock arms on the silence→speech transition
    only; mid-utterance TTS chunks must not re-arm it after the engine
    observed and cleared it (that filled the latency metric with ~0 ms
    mid-utterance samples)."""
    from mere_fusion_tpu.engines.base_asr import BaseASR

    asr = BaseASR(Config())
    asr.put_audio_frame(np.ones(asr.chunk, np.float32))
    assert asr.speech_start_ts is not None
    # engine ships the first frame and clears the clock
    asr.speech_start_ts = None
    # the TTS keeps streaming the same utterance: no re-arm
    asr.put_audio_frame(np.ones(asr.chunk, np.float32))
    asr.put_audio_frame(np.ones(asr.chunk, np.float32))
    assert asr.speech_start_ts is None
    # drain the utterance; the queue-empty silence ends the speech run
    for _ in range(3):
        frame, ftype = asr.get_audio_frame()
        assert ftype == 0
    # a one-chunk underrun must NOT end the utterance (debounce): a put
    # right after a single empty poll is still the same utterance
    frame, ftype = asr.get_audio_frame()
    assert ftype == 1  # silence synthesized
    asr.put_audio_frame(np.ones(asr.chunk, np.float32))
    assert asr.speech_start_ts is None
    asr.get_audio_frame()
    # sustained silence (>= silence_rearm_chunks empty polls) ends it
    for _ in range(asr.silence_rearm_chunks):
        frame, ftype = asr.get_audio_frame()
        assert ftype == 1
    # next utterance arms a fresh clock
    asr.put_audio_frame(np.ones(asr.chunk, np.float32))
    assert asr.speech_start_ts is not None
