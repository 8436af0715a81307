"""Default sentence segmentation for sentence-mode buffer trimming.

The reference requires an installed Moses/WtP tokenizer for
``--buffer_trimming sentence`` (whisper_online.py:573-616); our
``create_tokenizer`` keeps that factory contract with a dependency-free
rule splitter, so sentence trimming works with no injection."""
import numpy as np

from mere_fusion_tpu.asr import FakeBackend, StreamingTranscriber, Word
from mere_fusion_tpu.asr.sentences import RuleSentenceSplitter, create_tokenizer
from mere_fusion_tpu.asr.simulate import simulate_streaming


def test_english_basic_split():
    tok = create_tokenizer("en")
    sents = tok.split("Hello there. How are you? I am fine!")
    assert sents == ["Hello there.", "How are you?", "I am fine!"]


def test_english_abbreviations_and_numbers_do_not_split():
    tok = RuleSentenceSplitter("en")
    assert tok.split("Dr. Smith visited Mr. Jones at 3.14 Main St. today.") \
        == ["Dr. Smith visited Mr. Jones at 3.14 Main St. today."]
    assert tok.split("It cost 4.99 dollars. Then we left.") \
        == ["It cost 4.99 dollars.", "Then we left."]
    # initials: "J. K. Rowling" stays together
    assert tok.split("J. K. Rowling wrote it. We read it.") \
        == ["J. K. Rowling wrote it.", "We read it."]


def test_english_lowercase_continuation_does_not_split():
    tok = RuleSentenceSplitter("en")
    # a '.' followed by a lowercase word is not a sentence end (e.g. a
    # mid-sentence website or stray period from the ASR)
    assert tok.split("visit example.com please. Thanks a lot.") \
        == ["visit example.com please.", "Thanks a lot."]


def test_chinese_split_on_fullwidth_terminals():
    tok = create_tokenizer("zh")
    sents = tok.split("你好。今天天气怎么样？很好！")
    assert sents == ["你好。", "今天天气怎么样？", "很好！"]


def test_chinese_closers_stay_attached():
    tok = RuleSentenceSplitter("zh")
    assert tok.split("他说：「走吧。」然后离开了。") \
        == ["他说：「走吧。」", "然后离开了。"]


def test_mixed_content_routes_by_marks():
    tok = RuleSentenceSplitter("auto")
    sents = tok.split("好的。OK, let's go. 再见！")
    assert "好的。" in sents[0]
    assert any("再见" in s for s in sents)


def test_empty_and_unterminated():
    tok = RuleSentenceSplitter("en")
    assert tok.split("") == []
    assert tok.split("no terminal punctuation here") \
        == ["no terminal punctuation here"]


def _sentence_script(sent_words, t0=0.2, dt=0.4):
    words = [w for s in sent_words for w in s]
    return [(t0 + i * dt, t0 + (i + 1) * dt - 0.05, w)
            for i, w in enumerate(words)]


def test_sentence_mode_trims_without_injected_tokenizer():
    """buffer_trimming=("sentence", …) must work out of the box: the
    default splitter finds completed-sentence boundaries and the buffer
    trims at the second-to-last one (reference whisper_online.py:431-447
    chunk_completed_sentence keeps the last two sentences)."""
    sents = [["First.", ], ["Second", "sentence", "here."],
             ["Third", "one", "now."], ["Fourth", "arrives", "later."],
             ["Fifth", "is", "the", "tail."]]
    backend = FakeBackend(_sentence_script(sents), jitter_last=False)
    st = StreamingTranscriber(backend, buffer_trimming=("sentence", 2.0))
    assert st.tokenizer is not None, "sentence mode must default a splitter"
    audio = np.zeros(12 * 16000, dtype=np.float32)
    simulate_streaming(st, audio, min_chunk=1.0,
                       backend_offset_hook=backend.set_offset)
    assert st.buffer_time_offset > 0, "sentence trim must have fired"


def test_sentence_mode_trims_chinese():
    sents = [["你好。"], ["今天", "天气", "很好。"], ["我们", "出去", "走走。"],
             ["现在", "回家", "吧。"]]
    backend = FakeBackend(_sentence_script(sents), jitter_last=False)
    st = StreamingTranscriber(backend, buffer_trimming=("sentence", 2.0))
    audio = np.zeros(10 * 16000, dtype=np.float32)
    simulate_streaming(st, audio, min_chunk=1.0,
                       backend_offset_hook=backend.set_offset)
    assert st.buffer_time_offset > 0, "zh sentence trim must have fired"
