"""Streaming ASR: hypothesis stabilization + unbounded-audio transcription.

Host-side logic equivalent to the reference's whisper_online.py (the
LCP-commit HypothesisBuffer, growing audio buffer with prompt carry-over and
sentence/segment trimming — whisper_online.py:305-566), re-structured around
a typed backend protocol. Device work (the Whisper forward) lives in
backends; everything here is plain Python.
"""

from mere_fusion_tpu.asr.streaming import (  # noqa: F401
    HypothesisBuffer,
    StreamingTranscriber,
    Word,
)
from mere_fusion_tpu.asr.backends import (  # noqa: F401
    ASRBackend,
    FakeBackend,
    JaxWhisperBackend,
    OpenAIApiBackend,
    make_backend,
)
from mere_fusion_tpu.asr.normalizers import (  # noqa: F401
    BasicTextNormalizer,
    EnglishTextNormalizer,
)
from mere_fusion_tpu.asr.numwords import EnglishNumberNormalizer  # noqa: F401
from mere_fusion_tpu.asr.spelling import EnglishSpellingNormalizer  # noqa: F401
from mere_fusion_tpu.asr.vad import speech_segments, has_speech  # noqa: F401
