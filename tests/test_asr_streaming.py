import numpy as np
import pytest

from mere_fusion_tpu.asr import FakeBackend, HypothesisBuffer, StreamingTranscriber, Word
from mere_fusion_tpu.asr.simulate import simulate_streaming


def make_script(words, t0=0.2, dt=0.3):
    return [(t0 + i * dt, t0 + (i + 1) * dt - 0.05, w) for i, w in enumerate(words)]


def test_hypothesis_buffer_commits_lcp():
    hb = HypothesisBuffer()
    hb.insert([Word(0.0, 0.5, "hello"), Word(0.5, 1.0, "world")], 0.0)
    assert hb.flush() == []  # first hypothesis: nothing agreed yet
    hb.insert([Word(0.0, 0.5, "hello"), Word(0.5, 1.0, "there")], 0.0)
    out = hb.flush()
    assert [w.text for w in out] == ["hello"]
    assert hb.last_committed_time == 0.5


def test_hypothesis_buffer_ngram_dedup():
    hb = HypothesisBuffer()
    for _ in range(2):
        hb.insert([Word(0.0, 0.5, "a"), Word(0.5, 1.0, "b")], 0.0)
        hb.flush()
    # new hypothesis starting near last_committed_time repeating "a b"
    hb.insert([Word(0.1, 0.5, "a"), Word(0.5, 1.0, "b"), Word(1.0, 1.5, "c")], 0.9)
    assert [w.text for w in hb.new] == ["c"]


def test_streaming_commits_stable_words():
    words = ["the", "quick", "brown", "fox", "jumps"]
    backend = FakeBackend(make_script(words))
    st = StreamingTranscriber(backend)
    audio = np.zeros(int(2.5 * 16000), dtype=np.float32)
    result = simulate_streaming(
        st, audio, min_chunk=0.5, backend_offset_hook=backend.set_offset
    )
    text = " ".join(e.text for e in result.emissions)
    assert "the quick brown" in text
    # every scripted word eventually lands (finish() flushes the tail)
    for w in words[:4]:
        assert w in text


def test_streaming_trims_long_buffer():
    # 40 s of scripted speech with 0.4 s words; trim threshold 15 s
    n_words = 90
    backend = FakeBackend(make_script([f"w{i}" for i in range(n_words)], dt=0.4),
                          jitter_last=False)
    st = StreamingTranscriber(backend, buffer_trimming=("segment", 15.0))
    audio = np.zeros(40 * 16000, dtype=np.float32)
    simulate_streaming(st, audio, min_chunk=1.0, backend_offset_hook=backend.set_offset)
    assert st.buffer_time_offset > 0, "buffer must have been trimmed"
    assert st.buffer_seconds < 40


def test_prompt_is_bounded_suffix():
    backend = FakeBackend([], jitter_last=False)
    st = StreamingTranscriber(backend)
    st.committed = [Word(i * 0.1, i * 0.1 + 0.05, f"word{i}") for i in range(100)]
    st.buffer_time_offset = 100.0  # everything scrolled out
    prompt, _ = st.prompt()
    assert len(prompt) <= 210
    # the newest committed word is context, not prompt (reference parity)
    assert prompt.endswith("word98")


def test_openai_api_backend_stub_transport():
    """OpenAIApiBackend (whisper_online.py:165-246 parity): wav encoding,
    verbose_json params, VAD no-speech filtering, cost accounting."""
    from mere_fusion_tpu.asr.backends import OpenAIApiBackend

    sent = {}

    def transport(files, data):
        sent["files"] = files
        sent["data"] = data
        return {
            "text": "hello world again",
            "words": [
                {"start": 0.1, "end": 0.4, "word": "hello"},
                {"start": 0.5, "end": 0.9, "word": " world"},
                {"start": 2.1, "end": 2.4, "word": " again"},
            ],
            "segments": [
                {"start": 0.0, "end": 1.0, "no_speech_prob": 0.1},
                {"start": 2.0, "end": 3.0, "no_speech_prob": 0.95},
            ],
        }

    be = OpenAIApiBackend(language="en", transport=transport)
    audio = np.zeros(16000 + 1, np.float32)  # 1.0000625 s → ceil = 2 s billed
    res = be.transcribe(audio, init_prompt="prior text")
    assert be.transcribed_seconds == 2
    assert sent["data"]["model"] == "whisper-1"
    assert sent["data"]["language"] == "en"
    assert sent["data"]["prompt"] == "prior text"
    assert sent["data"]["response_format"] == "verbose_json"
    name, wav_bytes, mime = sent["files"]["file"]
    assert mime == "audio/wav" and wav_bytes[:4] == b"RIFF"

    words = be.ts_words(res)
    assert [w.text for w in words] == ["hello", " world", " again"]
    assert be.segments_end_ts(res) == [0.4, 0.9, 2.4]

    # VAD filters words inside the no-speech segment
    be.use_vad()
    words = be.ts_words(res)
    assert [w.text for w in words] == ["hello", " world"]

    # translate task drops the language param
    be2 = OpenAIApiBackend(language="en", transport=transport)
    be2.set_translate_task()
    be2.transcribe(audio)
    assert "language" not in sent["data"]


def test_openai_api_backend_in_streaming_transcriber():
    """The cloud backend slots into StreamingTranscriber like any other."""
    from mere_fusion_tpu.asr.backends import OpenAIApiBackend
    from mere_fusion_tpu.asr.streaming import StreamingTranscriber

    calls = []

    def transport(files, data):
        calls.append(data)
        return {
            "text": "stable words",
            "words": [
                {"start": 0.1, "end": 0.3, "word": "stable"},
                {"start": 0.4, "end": 0.6, "word": " words"},
            ],
            "segments": [{"start": 0.0, "end": 1.0, "no_speech_prob": 0.0}],
        }

    be = OpenAIApiBackend(transport=transport)
    st = StreamingTranscriber(be)
    audio = np.zeros(16000, np.float32)
    st.insert_audio_chunk(audio)
    st.process_iter()
    st.insert_audio_chunk(audio)
    beg, end, text = st.process_iter()
    assert "stable" in text and " words" in text
    assert len(calls) == 2


def test_transcribe_long_batched_chunks():
    """Chunked batch transcription (InsanelyFastWhisper mode): window
    splitting, batch padding, per-chunk timestamps."""
    from tests.test_whisper import SMALL
    from mere_fusion_tpu.asr.backends import JaxWhisperBackend

    be = JaxWhisperBackend(dims=SMALL, word_timestamps=False)
    be._sot = (1, 2)  # ids valid for the tiny test vocab
    window_s = SMALL.n_audio_ctx * 2 * 160 / 16000  # 0.96 s
    audio = np.random.default_rng(0).uniform(
        -0.1, 0.1, int(16000 * 2.5)).astype(np.float32)
    res = be.transcribe_long(audio, batch_size=2)
    assert len(res["chunks"]) == 3  # ceil(2.5 / 0.96)
    assert res["chunks"][0]["start"] == 0.0
    assert res["chunks"][1]["start"] == pytest.approx(window_s)
    assert res["chunks"][-1]["end"] == pytest.approx(2.5)
    assert res["duration"] == pytest.approx(2.5)
    for ch in res["chunks"]:
        assert all(isinstance(t, int) for t in ch["tokens"])
    assert res["text"] == "".join(c["text"] for c in res["chunks"])


def test_transcribe_long_beam_batched():
    """Beam-configured backends batch chunked decoding via vmap (each
    element runs its own beam search)."""
    from tests.test_whisper import SMALL
    from mere_fusion_tpu.asr.backends import JaxWhisperBackend

    be = JaxWhisperBackend(dims=SMALL, word_timestamps=False, beam_size=3)
    be._sot = (1, 2)
    audio = np.random.default_rng(1).uniform(
        -0.1, 0.1, int(16000 * 2.0)).astype(np.float32)
    res = be.transcribe_long(audio, batch_size=2)
    assert len(res["chunks"]) == 3  # ceil(2.0/0.96)
    for ch in res["chunks"]:
        assert all(isinstance(t, int) for t in ch["tokens"])
    # the beam path must agree with itself on identical chunks
    same = be.transcribe_long(audio[:15360], batch_size=2)
    again = be.transcribe_long(audio[:15360], batch_size=2)
    assert same["chunks"][0]["tokens"] == again["chunks"][0]["tokens"]


def test_vad_speech_segments_on_synthetic_audio():
    """Energy gate finds the tone burst inside silence, with hangover."""
    from mere_fusion_tpu.asr.vad import has_speech, speech_segments

    sr = 16000
    audio = np.zeros(3 * sr, np.float32)
    t = np.arange(sr) / sr
    audio[sr : 2 * sr] = 0.3 * np.sin(2 * np.pi * 440 * t)
    segs = speech_segments(audio)
    assert len(segs) == 1
    beg, end = segs[0]
    assert beg == pytest.approx(1.0, abs=0.15)
    assert end == pytest.approx(2.0, abs=0.15)
    assert not has_speech(np.zeros(sr, np.float32))
    # low-level broadband noise stays below the absolute floor
    noise = np.random.default_rng(0).normal(0, 1e-4, sr).astype(np.float32)
    assert not has_speech(noise)


def test_vad_wall_to_wall_speech_not_dropped():
    """A buffer that is ENTIRELY loud speech must be classified as speech.
    Regression: the uncapped adaptive threshold (10th percentile + margin)
    sat above every frame when the quietest frames were themselves speech,
    so continuous talkers were transcribed as silence."""
    from mere_fusion_tpu.asr.vad import speech_segments

    sr = 16000
    t = np.arange(2 * sr) / sr
    # ~-13 dBFS tone with mild amplitude modulation (uniformly loud)
    audio = (0.2 * (1.0 + 0.2 * np.sin(2 * np.pi * 3 * t))
             * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    segs = speech_segments(audio)
    covered = sum(e - b for b, e in segs)
    assert covered > 1.8, f"wall-to-wall speech covered only {covered:.2f}s"


def test_vad_word_filter():
    from mere_fusion_tpu.asr.streaming import Word
    from mere_fusion_tpu.asr.vad import filter_words

    words = [Word(0.1, 0.4, "a"), Word(1.1, 1.4, "b"), Word(2.5, 2.9, "c")]
    kept = filter_words(words, [(1.0, 2.0)])
    assert [w.text for w in kept] == ["b"]
    assert filter_words(words, None) == words


def test_jax_backend_vad_skips_silence_and_filters(monkeypatch):
    """--vad on the local backend: silence buffers skip the device decode
    entirely; decoded words outside speech spans are dropped."""
    from tests.test_whisper import SMALL
    from mere_fusion_tpu.asr.backends import JaxWhisperBackend

    be = JaxWhisperBackend(dims=SMALL, word_timestamps=False)
    be._sot = (1, 2)
    be.use_vad()
    decodes = []
    orig = be._decode
    be._decode = lambda *a, **k: (decodes.append(1), orig(*a, **k))[1]

    res = be.transcribe(np.zeros(16000, np.float32))
    assert res["tokens"] == [] and decodes == []
    assert be.ts_words(res) == []

    sr = 16000
    audio = np.zeros(2 * sr, np.float32)
    t = np.arange(sr) / sr
    audio[:sr] = 0.3 * np.sin(2 * np.pi * 330 * t)  # speech in first half
    res = be.transcribe(audio)
    assert len(decodes) == 1  # speech present -> decoded on device
    assert res["speech"] and res["speech"][0][0] == pytest.approx(0.0, abs=0.15)
    # every surviving word overlaps the detected speech span
    for w in be.ts_words(res):
        assert any(w.beg < e and w.end > b for b, e in res["speech"])


def test_vad_streaming_transcriber_emits_nothing_on_silence():
    """StreamingTranscriber + VAD-enabled local backend over a silent
    stream: no words commit and no device decodes run."""
    from tests.test_whisper import SMALL
    from mere_fusion_tpu.asr.backends import JaxWhisperBackend
    from mere_fusion_tpu.asr.streaming import StreamingTranscriber

    be = JaxWhisperBackend(dims=SMALL, word_timestamps=False)
    be._sot = (1, 2)
    be.use_vad()
    decodes = []
    orig = be._decode
    be._decode = lambda *a, **k: (decodes.append(1), orig(*a, **k))[1]

    st = StreamingTranscriber(be, buffer_trimming=("segment", 15.0))
    for _ in range(4):
        st.insert_audio_chunk(np.zeros(8000, np.float32))
        beg, end, text = st.process_iter()
        assert text == ""
    assert decodes == []


def test_timestamp_segments_parser():
    """Timestamp-token segmentation (reference vendored-whisper
    transcribe.py:103-127 slices-between-timestamp-pairs, on fixed
    windows): <|t|> ids split a window into sub-segments."""
    from mere_fusion_tpu.asr.backends import timestamp_segments

    TB = 1000  # stand-in timestamp_begin; id TB+k == k*0.02 s
    ts = lambda sec: TB + int(round(sec / 0.02))
    # <|0.00|> a b <|1.00|> <|1.00|> c <|2.50|>
    toks = [ts(0.0), 1, 2, ts(1.0), ts(1.0), 3, ts(2.5)]
    segs = timestamp_segments(toks, TB, 30.0)
    assert segs == [(0.0, 1.0, [1, 2]), (1.0, 2.5, [3])]

    # trailing text without a closing timestamp ends at the window bound
    segs = timestamp_segments([ts(0.5), 7, 8], TB, 30.0)
    assert segs == [(0.5, 30.0, [7, 8])]

    # non-monotonic and over-window timestamps clamp
    segs = timestamp_segments([ts(2.0), 1, ts(1.0), ts(40.0), 2], TB, 30.0)
    assert segs[0] == (2.0, 2.0, [1])
    assert segs[1] == (30.0, 30.0, [2])

    # no timestamps at all (or disabled): one window-spanning segment
    assert timestamp_segments([5, 6], TB, 30.0) == [(0.0, 30.0, [5, 6])]
    assert timestamp_segments([5, 6], None, 30.0) == [(0.0, 30.0, [5, 6])]

    # empty decode still covers the window
    assert timestamp_segments([], TB, 30.0) == [(0.0, 30.0, [])]
