import numpy as np

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
