"""Transcript normalizers (reference: musetalk/whisper/whisper/normalizers/)."""
import pytest

from mere_fusion_tpu.asr.normalizers import (
    BasicTextNormalizer,
    EnglishTextNormalizer,
)


def test_basic_lowercase_symbols_whitespace():
    n = BasicTextNormalizer()
    assert n("Hello,   World!!") == "hello world"
    assert n("A [noise] B <cough> C (laughs) D") == "a b c d"
    assert n("multi\n line\ttext") == "multi line text"


def test_basic_diacritics_modes():
    n_keep = BasicTextNormalizer(remove_diacritics=False)
    n_drop = BasicTextNormalizer(remove_diacritics=True)
    assert n_keep("café") == "café"
    assert n_drop("café") == "cafe"
    assert n_drop("Œuvre ßtraße") == "oeuvre sstrasse"


def test_basic_split_letters():
    n = BasicTextNormalizer(split_letters=True)
    assert n("ab cd") == "a b c d"


def test_english_contractions_and_titles():
    n = EnglishTextNormalizer()
    assert n("I won't, you can't, they'll see") == \
        "i will not you can not they will see"
    assert n("we're, I'm, you've, he'd") == "we are i am you have he would"
    assert n("Mr. Smith met Dr. Jones") == "mister smith met doctor jones"
    assert n("let's go") == "let us go"


def test_english_fillers_and_numbers():
    n = EnglishTextNormalizer()
    assert n("uh I think, um, it's fine") == "i think it is fine"
    assert n("costs $3.50, or 1,000 units.") == "costs $3.50 or 1,000 units"


def test_same_normalizer_makes_variants_equal():
    """The acceptance use-case: reference and our transcripts differing only
    in case/punct/contractions compare equal post-normalization."""
    n = EnglishTextNormalizer()
    ours = "we'll render, uh, twenty-five FPS — that's the target."
    ref = "We will render twenty five fps: that is the target!"
    assert n(ours) == n(ref)
