import os

import pytest

from mere_fusion_tpu.utils.bpe import (
    DEFAULT_MULTILINGUAL_ASSETS,
    BPETokenizer,
    load_whisper_tokenizer,
)

HAVE_ASSETS = os.path.isdir(DEFAULT_MULTILINGUAL_ASSETS)


def test_tiny_handbuilt_bpe():
    vocab = {"h": 0, "e": 1, "l": 2, "o": 3, "he": 4, "ll": 5, "hell": 6, "Ġ": 7}
    merges = [("h", "e"), ("l", "l"), ("he", "ll")]
    tok = BPETokenizer(vocab, merges)
    assert tok.encode("hello") == [6, 3]
    assert tok.decode([6, 3]) == "hello"


@pytest.mark.skipif(not HAVE_ASSETS, reason="whisper assets not mounted")
def test_whisper_multilingual_roundtrip():
    tok = load_whisper_tokenizer()
    for text in ["hello world", " The quick brown fox.", "многоязычный", "你好"]:
        ids = tok.encode(text)
        assert all(isinstance(i, int) for i in ids)
        assert tok.decode(ids) == text


@pytest.mark.skipif(not HAVE_ASSETS, reason="whisper assets not mounted")
def test_whisper_matches_transformers():
    transformers = pytest.importorskip("transformers")
    tok = load_whisper_tokenizer()
    hf = transformers.GPT2TokenizerFast(
        vocab_file=os.path.join(DEFAULT_MULTILINGUAL_ASSETS, "vocab.json"),
        merges_file=os.path.join(DEFAULT_MULTILINGUAL_ASSETS, "merges.txt"),
    )
    for text in ["hello world", "Streaming ASR, on TPU!", "数字人 demo 123"]:
        assert tok.encode(text) == hf.encode(text)
        assert tok.decode(tok.encode(text)) == text
