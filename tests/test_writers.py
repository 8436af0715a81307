"""Transcript writers: txt/vtt/srt formats and timestamp rules match the
reference's vendored whisper utilities
(reference: musetalk/whisper/whisper/utils.py:30-88)."""
from __future__ import annotations

import io

import pytest

from mere_fusion_tpu.asr.writers import (
    chunks_to_segments,
    compression_ratio,
    emissions_to_segments,
    format_timestamp,
    write_srt,
    write_txt,
    write_vtt,
)

SEGS = [
    {"start": 0.0, "end": 1.5, "text": " hello world "},
    {"start": 61.25, "end": 3723.004, "text": "a --> b"},
]


def test_format_timestamp_reference_rules():
    # vtt style: '.' marker, hours omitted when zero
    assert format_timestamp(0.0) == "00:00.000"
    assert format_timestamp(1.5) == "00:01.500"
    assert format_timestamp(61.25) == "01:01.250"
    assert format_timestamp(3723.004) == "01:02:03.004"
    # srt style: ',' marker, hours always present
    assert format_timestamp(1.5, True, ",") == "00:00:01,500"
    assert format_timestamp(3723.004, True, ",") == "01:02:03,004"
    with pytest.raises(AssertionError):
        format_timestamp(-0.5)
    # rounding, not truncation (reference: round(seconds * 1000.0))
    assert format_timestamp(0.0006) == "00:00.001"


def test_write_txt():
    buf = io.StringIO()
    write_txt(SEGS, buf)
    assert buf.getvalue() == "hello world\na --> b\n"


def test_write_vtt():
    buf = io.StringIO()
    write_vtt(SEGS, buf)
    assert buf.getvalue() == (
        "WEBVTT\n\n"
        "00:00.000 --> 00:01.500\nhello world\n\n"
        "01:01.250 --> 01:02:03.004\na -> b\n\n"
    )


def test_write_srt():
    buf = io.StringIO()
    write_srt(SEGS, buf)
    assert buf.getvalue() == (
        "1\n00:00:00,000 --> 00:00:01,500\nhello world\n\n"
        "2\n00:01:01,250 --> 01:02:03,004\na -> b\n\n"
    )


def test_segment_adapters():
    from mere_fusion_tpu.asr.simulate import Emission

    ems = [Emission(1.0, 0.0, 0.8, "hi"),
           Emission(2.0, None, None, ""),      # finish() tail without spans
           Emission(3.0, 1.0, 2.0, " there")]
    segs = emissions_to_segments(ems)
    assert segs == [{"start": 0.0, "end": 0.8, "text": "hi"},
                    {"start": 1.0, "end": 2.0, "text": " there"}]
    chunks = [{"start": 0.0, "end": 30.0, "text": "x", "extra": 1}]
    assert chunks_to_segments(chunks) == [
        {"start": 0.0, "end": 30.0, "text": "x"}]


def test_compression_ratio_flags_repetition():
    assert compression_ratio("ha " * 200) > 2.4 > compression_ratio(
        "the quick brown fox jumps over the lazy dog")


def test_cli_writes_srt(tmp_path, monkeypatch):
    """--output-format srt through the simulation CLI with a scripted fake
    backend (word commits → numbered srt cues)."""
    import numpy as np
    from scipy.io import wavfile

    import mere_fusion_tpu.asr as asr_pkg
    from mere_fusion_tpu.asr.__main__ import main
    from mere_fusion_tpu.asr.backends import FakeBackend

    script = [(0.2, 0.5, "hello"), (0.6, 0.9, "there"), (1.1, 1.4, "friend")]
    monkeypatch.setattr(
        asr_pkg, "make_backend",
        lambda name, **kw: FakeBackend(script, jitter_last=False))

    wav = tmp_path / "t.wav"
    wavfile.write(str(wav), 16000,
                  (np.sin(np.linspace(0, 440 * 6.28, 32000)) * 0.3 * 32767
                   ).astype(np.int16))
    out = tmp_path / "t.srt"
    main([str(wav), "--mode", "unaware",
          "--output-format", "srt", "--output-file", str(out)])
    text = out.read_text()
    assert text.startswith("1\n00:00:00,")
    assert " --> " in text and "hello" in text
