"""Transcript normalizers for WER-style comparisons.

Behavioral re-implementation of the vendored Whisper normalizers the
reference ships (reference: musetalk/whisper/whisper/normalizers/basic.py
and english.py) — used when comparing our streaming transcripts against
reference transcripts, where raw strings differ only in case, punctuation,
and contracted forms.

``BasicTextNormalizer`` matches the reference's semantics: bracketed
asides dropped, unicode symbols/punctuation → spaces (optionally with
diacritic stripping via NFKD), lowercase, collapsed whitespace.

``EnglishTextNormalizer`` covers the high-frequency transformations:
bracket removal, filler-word removal, contraction expansion (including
common irregulars), possessive normalization, punctuation stripping with
currency/decimal preservation, and whitespace collapse. The reference
additionally rewrites number words to digits and applies a 1,700-entry
British→American spelling table (english.json); those long-tail rewrites
are out of scope here and documented as such — both sides of a comparison
should be passed through the SAME normalizer, which makes the comparison
valid without them.
"""
from __future__ import annotations

import re
import unicodedata

ADDITIONAL_DIACRITICS = {
    "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O", "æ": "ae", "Æ": "AE",
    "ß": "ss", "ẞ": "SS", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "th", "ł": "l", "Ł": "L",
}


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """Drop diacritic marks (NFKD combining chars) and replace every
    symbol/punctuation codepoint with a space, keeping ``keep`` chars."""
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif c in ADDITIONAL_DIACRITICS:
            out.append(ADDITIONAL_DIACRITICS[c])
        else:
            cat = unicodedata.category(c)
            if cat == "Mn":
                continue          # combining diacritic: drop
            if cat[0] in "MSP":
                out.append(" ")   # symbol/punctuation: space
            else:
                out.append(c)
    return "".join(out)


def remove_symbols(s: str) -> str:
    """Replace symbols/punctuation with spaces; keep diacritics."""
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s)
    )


class BasicTextNormalizer:
    def __init__(self, remove_diacritics: bool = False,
                 split_letters: bool = False):
        self.clean = (remove_symbols_and_diacritics if remove_diacritics
                      else remove_symbols)
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)   # <asides> and [asides]
        s = re.sub(r"\(([^)]+?)\)", "", s)        # (asides)
        s = self.clean(s).lower()
        if self.split_letters:
            s = " ".join(s.replace(" ", ""))
        return re.sub(r"\s+", " ", s).strip()


_FILLERS = r"\b(hmm+|mm+|mhm+|uh+|um+|huh|ah+|er+)\b"

_CONTRACTION_IRREGULARS = {
    "won't": "will not", "can't": "can not", "shan't": "shall not",
    "cannot": "can not", "let's": "let us", "ain't": "aint",
    "y'all": "you all", "wanna": "want to", "gonna": "going to",
    "gotta": "got to", "gimme": "give me", "lemme": "let me",
    "'cause": "because", "cuz": "because", "ma'am": "madam",
    "o'clock": "oclock", "ol'": "old",
}

_CONTRACTION_SUFFIXES = [
    (r"n't\b", " not"),
    (r"'re\b", " are"),
    (r"'ve\b", " have"),
    (r"'ll\b", " will"),
    (r"'m\b", " am"),
    (r"'d\b", " would"),
]

_TITLES = {
    "mr": "mister", "mrs": "missus", "st": "saint", "dr": "doctor",
    "prof": "professor", "capt": "captain", "gov": "governor",
    "ald": "alderman", "gen": "general", "sen": "senator",
    "rep": "representative", "pres": "president", "rev": "reverend",
    "hon": "honorable", "asst": "assistant", "assoc": "associate",
    "lt": "lieutenant", "col": "colonel", "jr": "junior", "sr": "senior",
    "esq": "esquire",
}


class EnglishTextNormalizer:
    """High-frequency subset of the reference English normalizer
    (reference: musetalk/whisper/whisper/normalizers/english.py) — see the
    module docstring for the documented scope."""

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)
        s = re.sub(r"\(([^)]+?)\)", "", s)
        s = re.sub(_FILLERS, "", s)
        s = re.sub(r"\s+'", "'", s)               # standalone apostrophes

        for src, dst in _CONTRACTION_IRREGULARS.items():
            s = s.replace(src, dst)
        for pat, repl in _CONTRACTION_SUFFIXES:
            s = re.sub(pat, repl, s)
        s = re.sub(r"(\w)'s\b", r"\1 is", s)      # he's -> he is (approx.)

        # titles: "mr." / "dr." etc.
        def title(m):
            return _TITLES.get(m.group(1), m.group(1)) + " "

        s = re.sub(r"\b(" + "|".join(_TITLES) + r")\.?\s", title, s + " ")

        # punctuation: keep intra-number separators and currency
        s = re.sub(r"[.,](?![0-9])", " ", s)
        s = re.sub(r"(?<=[a-z])-(?=[a-z])", " ", s)   # compound words
        s = re.sub(r"[^\w\s$£€.,%-]", " ", s)
        s = re.sub(r"\s+", " ", s)
        return s.strip()
