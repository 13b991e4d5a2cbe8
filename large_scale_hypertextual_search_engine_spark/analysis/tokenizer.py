"""Reference-compat tokenizer.

Re-implements the observed tokenization semantics of the reference
cleaner (reference: cleaner3.cpp:265-411), validated token-exact against
the golden ``cleaner3*.jsonl`` fixtures (SURVEY.md Appendix A, quirk
register Q5/Q12):

1. NFC normalize.
2. Dehyphenate across line breaks: drop ``-`` followed by newline(s).
3. Map ``\\n \\r \\t`` to spaces.
4. Lowercase ASCII ``A-Z`` only (the fixtures were built under the C
   locale: non-ASCII letters keep their case).
5. Token chars: Unicode alphanumerics minus {U+00B5 µ, U+2070 ⁰} (the
   fixture build env's ``iswalnum``), plus apostrophe U+0027 iff both
   immediate neighbors are alphabetic.
6. Positions are 1-based per field and allocated on flush *before*
   number/stopword filtering (filtered tokens leave gaps — Q12).
7. ``orig`` is the lowercased unstemmed token, except tokens flushed at
   a non-kept apostrophe, which carry the original-case text (an
   observed reference quirk we reproduce for fixture parity).
"""

from __future__ import annotations

import re
import unicodedata
from typing import NamedTuple

from .stemmer import stem as _stem

# ASCII fast path: candidate runs of token chars + apostrophe; runs are
# then split at apostrophes that lack alphabetic neighbors (exactly the
# char-loop semantics, but regex-scanned)
_ASCII_RUN = re.compile(r"[a-z0-9']+")
_BAD_APOSTROPHE = re.compile(r"(?<![a-z])'|'(?![a-z])")

# 21-word built-in default stoplist of the reference cleaner.
DEFAULT_STOPWORDS = frozenset(
    "the and is in it of to a for that on with as are by this was an be or from".split()
)

_EXCLUDED_ALNUM = {"µ", "⁰"}
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)
_CTRL_TO_SPACE = str.maketrans({"\n": " ", "\r": " ", "\t": " "})
_ASCII_DIGITS = frozenset("0123456789")


class Token(NamedTuple):
    term: str
    pos: int
    orig: str


def _is_token_char(c: str) -> bool:
    return c.isalnum() and c not in _EXCLUDED_ALNUM


def _is_alpha(c: str) -> bool:
    # the fixture build env's iswalpha rejects µ/⁰ just like iswalnum
    return c.isalpha() and c not in _EXCLUDED_ALNUM


def tokenize_compat(
    raw: str,
    *,
    stem: bool = True,
    stopwords: frozenset[str] | None = None,
    remove_numbers: bool = False,
    keep_original: bool = True,
) -> list[Token]:
    """Tokenize one field, reference-compat. Returns [(term, pos, orig)]."""
    if not raw:
        return []
    norm = unicodedata.normalize("NFC", raw)
    # dehyphenation across line breaks
    if "-\n" in norm or "-\r" in norm:
        out_chars: list[str] = []
        i, n = 0, len(norm)
        while i < n:
            if norm[i] == "-" and i + 1 < n and norm[i + 1] in "\n\r":
                i += 1
                while i < n and norm[i] in "\n\r":
                    i += 1
            else:
                out_chars.append(norm[i])
                i += 1
        norm = "".join(out_chars)
    norm = norm.translate(_CTRL_TO_SPACE)
    low = norm.translate(_ASCII_LOWER)

    sw = stopwords if stopwords is not None else frozenset()
    if norm.isascii():
        return _tokenize_ascii_fast(
            low, norm, stem, sw, remove_numbers, keep_original
        )
    out: list[Token] = []
    pos = 0
    start = -1  # start index of current token run, -1 = none
    i, n = 0, len(low)

    def flush(end: int, orig_case: bool) -> None:
        nonlocal pos, start
        if start < 0:
            return
        pos += 1
        term = low[start:end]
        if remove_numbers and all(ch in _ASCII_DIGITS for ch in term):
            start = -1
            return
        if term in sw:
            start = -1
            return
        orig = norm[start:end] if orig_case else term
        final = _stem(term) if stem else term
        out.append(Token(final, pos, orig if keep_original else ""))
        start = -1

    while i < n:
        c = low[i]
        if c == "'":
            keep = (
                0 < i < n - 1 and _is_alpha(low[i - 1]) and _is_alpha(low[i + 1])
            )
            if keep:
                if start < 0:
                    start = i
                i += 1
                continue
            flush(i, orig_case=True)
            i += 1
            continue
        if _is_token_char(c):
            if start < 0:
                start = i
            i += 1
            continue
        flush(i, orig_case=False)
        i += 1
    flush(n, orig_case=False)
    return out


def _tokenize_ascii_fast(
    low: str,
    norm: str,
    stem: bool,
    sw: frozenset[str],
    remove_numbers: bool,
    keep_original: bool,
) -> list[Token]:
    """Regex-scanned fast path, exactly equivalent to the char loop for
    ASCII input (the overwhelmingly common case): candidate runs of
    ``[a-z0-9']`` are split at apostrophes without alphabetic neighbors;
    a token flushed AT such an apostrophe carries the original-case orig
    (the reference quirk), tokens flushed at run end carry the
    lowercased term."""
    out: list[Token] = []
    pos = 0
    for m in _ASCII_RUN.finditer(low):
        run = m.group()
        base = m.start()
        if "'" not in run:
            pos += 1
            if remove_numbers and run.isdigit():
                continue
            if run in sw:
                continue
            final = _stem(run) if stem else run
            out.append(Token(final, pos, run if keep_original else ""))
            continue
        # split the run at "bad" apostrophes (no alpha on either side)
        start = 0
        n = len(run)
        for i in range(n + 1):
            at_bad = False
            if i < n and run[i] == "'":
                left_ok = i > 0 and run[i - 1].isalpha()
                right_ok = i + 1 < n and run[i + 1].isalpha()
                at_bad = not (left_ok and right_ok)
                if not at_bad:
                    continue
            elif i < n:
                continue
            piece = run[start:i]
            if piece:
                pos += 1
                keep = True
                if remove_numbers and piece.isdigit():
                    keep = False
                elif piece in sw:
                    keep = False
                if keep:
                    orig = (
                        norm[base + start : base + i] if at_bad else piece
                    )
                    final = _stem(piece) if stem else piece
                    out.append(Token(final, pos, orig if keep_original else ""))
            start = i + 1
    return out


def tokenize_simple(text: str) -> list[str]:
    """Whitespace tokenizer (SQL-oracle-matched mode: split on ' ')."""
    if not text:
        return []
    return [t for t in text.split(" ") if t]


def split_sections(sections: str) -> list[tuple[str, str]]:
    """Split the extractor's ``" | "``-joined sections column into
    (field_name, text) pairs (reference: cleaner3.cpp:414-430,568-583):
    name = text before the first ``:`` if its index < 50, else "body"."""
    out: list[tuple[str, str]] = []
    for part in sections.split(" | "):
        part = part.strip(" \t\r\n")
        if not part:
            continue
        pcol = part.find(":")
        if 0 <= pcol < 50:
            out.append((part[:pcol], part[pcol + 1 :]))
        else:
            out.append(("body", part))
    return out
