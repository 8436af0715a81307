import numpy as np
import pytest

from mere_fusion_tpu.ops import (
    WAV2LIP_MEL,
    WHISPER_MEL,
    mel_filterbank,
    melspectrogram,
)
from tests.golden_dsp import (
    slaney_mel,
    wav2lip_mel_golden,
    whisper_mel_golden,
)


@pytest.fixture
def speech_like():
    rng = np.random.default_rng(0)
    t = np.arange(16000, dtype=np.float32) / 16000.0
    x = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t + 0.3)
        + 0.05 * rng.standard_normal(len(t))
    )
    return x.astype(np.float32)


def test_filterbank_matches_golden():
    got = mel_filterbank(WAV2LIP_MEL)
    want = slaney_mel(16000, 800, 80, 55.0, 7600.0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_w = mel_filterbank(WHISPER_MEL)
    want_w = slaney_mel(16000, 400, 80, 0.0, 8000.0)
    np.testing.assert_allclose(got_w, want_w, atol=1e-6)


def test_wav2lip_mel_matches_golden(speech_like):
    got = np.asarray(melspectrogram(speech_like, WAV2LIP_MEL))
    want = wav2lip_mel_golden(speech_like)
    assert got.shape == want.shape == (80, 1 + len(speech_like) // 200)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_whisper_mel_matches_golden(speech_like):
    got = np.asarray(melspectrogram(speech_like, WHISPER_MEL))
    want = whisper_mel_golden(speech_like)
    assert got.shape == want.shape == (80, len(speech_like) // 160)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_mel_silence_is_floor():
    silent = np.zeros(8000, dtype=np.float32)
    got = np.asarray(melspectrogram(silent, WAV2LIP_MEL))
    np.testing.assert_allclose(got, -4.0, atol=1e-5)
