"""Porter-variant stemmer, reference-compat.

Re-implements the *observed behavior* of the reference's compact Porter
stemmer (reference: cleaner3.cpp:49-191), which differs from canonical
Porter in one load-bearing way: its ``measure()`` counts *vowel groups*
(so a trailing vowel group counts toward m — "sequences" -> "sequ",
"mosaic" -> "mosa"), per SURVEY.md Appendix B. Verified token-exact
against the golden fixtures (21,921 orig->term pairs) in
tests/test_analyzer_golden.py.

The reference operates on raw UTF-8 *bytes* (C++ std::string). To be
bit-compatible for non-ASCII tokens we do the same: the public ``stem``
round-trips through a latin-1 view so every byte is one "char".
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    ch = w[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    # Counts vowel groups (nonstandard: trailing vowels count).
    n = 0
    i = 0
    ln = len(w)
    while i < ln:
        while i < ln and _is_cons(w, i):
            i += 1
        if i >= ln:
            break
        while i < ln and not _is_cons(w, i):
            i += 1
        n += 1
    return n


def _contains_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _double_consonant(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    ln = len(w)
    if ln < 3:
        return False
    if not _is_cons(w, ln - 1) or _is_cons(w, ln - 2) or not _is_cons(w, ln - 3):
        return False
    return w[-1] not in "wxy"


_STEP2_RULES = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)

_STEP3_RULES = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4_SUFFIXES = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        stem = w[:-3]
        if _measure(stem) > 0:
            return stem + "ee"
        return w
    if (w.endswith("ed") and _contains_vowel(w[:-2])) or (
        w.endswith("ing") and _contains_vowel(w[:-3])
    ):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            return w + "e"
        if _double_consonant(w) and w[-1] not in "lsz":
            return w[:-1]
        if _measure(w) == 1 and _cvc(w):
            return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _contains_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


def _step2(w: str) -> str:
    for suf, repl in _STEP2_RULES:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                return stem + repl
            return w
    return w


def _step3(w: str) -> str:
    for suf, repl in _STEP3_RULES:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                return stem + repl
            return w
    return w


def _step4(w: str) -> str:
    for suf in _STEP4_SUFFIXES:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion":
                    if stem and stem[-1] in "st":
                        return stem
                else:
                    return stem
            return w
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if _measure(w) > 1 and _double_consonant(w) and w[-1] == "l":
        return w[:-1]
    return w


def _stem_bytesview(w: str) -> str:
    """Stem a latin-1 byte-view string (one char == one input byte)."""
    if len(w) <= 2:
        return w
    for step in (
        _step1a, _step1b, _step1c, _step2, _step3, _step4, _step5a, _step5b,
    ):
        w = step(w)
    return w


_memo: dict[str, str] = {}


def stem(s: str) -> str:
    """Stem one token (UTF-8 semantics identical to the reference)."""
    hit = _memo.get(s)
    if hit is not None:
        return hit
    if s.isascii():
        out = _stem_bytesview(s)
    else:
        # byte-wise processing: non-ASCII chars become multiple latin-1
        # "consonant" bytes, exactly like the reference's std::string view
        bv = s.encode("utf-8").decode("latin-1")
        out_bv = _stem_bytesview(bv)
        try:
            out = out_bv.encode("latin-1").decode("utf-8")
        except UnicodeDecodeError:
            # suffix stripping cut a multibyte sequence; keep raw bytes
            # semantics (the reference would emit the truncated bytes)
            out = out_bv.encode("latin-1").decode("utf-8", errors="surrogateescape")
    if len(_memo) < 2_000_000:
        _memo[s] = out
    return out


def stem_many(tokens: list[str]) -> list[str]:
    """Stem a batch of tokens (memoized)."""
    return [stem(t) for t in tokens]
