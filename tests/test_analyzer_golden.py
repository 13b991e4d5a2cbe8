"""Token-exact analyzer parity against the golden cleaner fixtures.

Covers SURVEY.md §5.2.1: all ~37.7k tokens (term, pos, orig) of both
corpora must match byte-identically, plus targeted stemmer cases for the
nonstandard vowel-group measure().
"""

import json

import pytest

from large_scale_hypertextual_search_engine_spark.analysis.stemmer import stem
from large_scale_hypertextual_search_engine_spark.analysis.tokenizer import (
    DEFAULT_STOPWORDS,
    tokenize_compat,
)
from golden_utils import REF, doc_fields, read_cleaned_jsonl, read_tsv_rows

CASES = [
    (REF / "out.tsv", REF / "cleaner3.jsonl"),
    (REF / "outpmc.tsv", REF / "cleaner3pmc.jsonl"),
]


@pytest.mark.parametrize("tsv,gold", CASES, ids=["pdf", "pmc"])
def test_token_parity(tsv, gold):
    rows = read_tsv_rows(tsv)
    golds = read_cleaned_jsonl(gold)
    assert len(rows) == len(golds)
    compared = 0
    for cols, g in zip(rows, golds):
        docid, fields = doc_fields(cols)
        assert docid == g["docid"]
        gf = g["fields"]
        assert len(fields) == len(gf), docid
        for (name, text), gfield in zip(fields, gf):
            assert name == gfield["name"]
            toks = tokenize_compat(text, stem=True, stopwords=None, keep_original=True)
            expect = gfield["tokens"]
            assert len(toks) == len(expect), (docid, name)
            for t, e in zip(toks, expect):
                assert (t.term, t.pos, t.orig) == (e["term"], e["pos"], e.get("orig", ""))
                compared += 1
    assert compared > 15000


def test_stemmer_nonstandard_measure():
    # trailing vowel groups count toward m in the reference's measure()
    assert stem("sequences") == "sequ"
    assert stem("mosaic") == "mosa"
    # classic Porter behaviors preserved
    assert stem("caresses") == "caress"
    assert stem("ponies") == "poni"
    assert stem("at") == "at"  # len <= 2 unchanged
    assert stem("a") == "a"


def test_stemmer_golden_pairs_exhaustive():
    pairs = set()
    for _, gold in CASES:
        for doc in read_cleaned_jsonl(gold):
            for field in doc["fields"]:
                for tok in field["tokens"]:
                    orig = tok.get("orig", "")
                    if orig:
                        pairs.add((orig, tok["term"]))
    assert len(pairs) > 3000
    # orig keeps original case for apostrophe-flushed tokens; the term is
    # stemmed from the ASCII-lowercased token
    lower = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    bad = [(o, e, stem(o.translate(lower))) for o, e in pairs if stem(o.translate(lower)) != e]
    assert not bad, bad[:10]


def test_tokenizer_flags():
    toks = tokenize_compat("The 42 cats running", stem=False,
                           stopwords=DEFAULT_STOPWORDS, remove_numbers=True)
    # positions allocated before filtering leave gaps (quirk Q12)
    assert [(t.term, t.pos) for t in toks] == [("cats", 3), ("running", 4)]
    toks = tokenize_compat("don't can't o'brien 'quoted'", stem=False)
    assert [t.term for t in toks] == ["don't", "can't", "o'brien", "quoted"]


def test_tokenizer_charset_edges():
    # µ and ⁰ are delimiters; other unicode alnums are token chars
    toks = tokenize_compat("5µm x⁰y Δfoo", stem=False)
    assert [t.term for t in toks] == ["5", "m", "x", "y", "Δfoo"]
    # ASCII-only lowercase: Δ keeps case, A-Z folds
    toks = tokenize_compat("ΔG FOO", stem=False)
    assert [t.term for t in toks] == ["Δg", "foo"]
